"""Record held-out eval metrics for every shipped checkpoint.

VERDICT r3 missing #4: shipped-quality claims must live in machine-checkable
artifacts, not prose — a WER-0.97 ASR checkpoint shipped in round 3 because
its quality claim existed only in docstrings. The ASR trainer now writes
``eval.json`` at save time (training/train_whisper_asr.save_asr) and the
``auto`` resolver gates on it; this tool provides the same recorded-quality
artifact for the OTHER shipped checkpoints by re-measuring each one's
held-out protocol (the exact protocols tests/test_shipped_assets.py pins,
with the same never-trained-on seeds) and writing
``msa_tpu/checkpoints/metrics.json``.

Run on CPU (no TPU needed — the eval models are small):
    python tools/record_asset_metrics.py
tests/test_shipped_assets.py::test_shipped_metrics_recorded pins that the
recorded values exist and pass the same bars the live tests assert.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from msa_tpu.utils.assets import resolve_asset  # noqa: E402

OUT = "msa_tpu/checkpoints/metrics.json"


def _speaker() -> dict:
    """GE2E embedder: same/different cosine separation on 3 fresh voices
    (tests/test_shipped_assets.py::test_shipped_speaker_embedder_separates_voices)."""
    from msa_tpu.models.speaker import (
        SpeakerConfig,
        SpeakerEmbeddingNet,
        load_params,
        random_voice,
        synth_voice,
    )

    cfg = SpeakerConfig()
    model = SpeakerEmbeddingNet(cfg)
    params = load_params(model, resolve_asset("checkpoints/speaker_embedder.msgpack"))
    voice_rng = np.random.default_rng(987654)
    voices = [random_voice(voice_rng) for _ in range(6)]
    ws = cfg.window_samples
    utts, labels = [], []
    for spk, v in enumerate(voices):
        for _ in range(4):
            utts.append(
                synth_voice(voice_rng, v, cfg.window_seconds, cfg.sample_rate)[:ws]
            )
            labels.append(spk)
    embs = np.asarray(model.embed_windows(params, np.stack(utts)))
    sim = embs @ embs.T
    labels = np.asarray(labels)
    off = ~np.eye(len(labels), dtype=bool)
    same = float(sim[(labels[:, None] == labels[None, :]) & off].mean())
    diff = float(sim[labels[:, None] != labels[None, :]].mean())
    return {
        "same_voice_cos": round(same, 4),
        "diff_voice_cos": round(diff, 4),
        "separation": round(same - diff, 4),
        "protocol": "6 fresh voices x 4 windows, seed 987654",
        "bar": {"separation": ">0.5"},
    }


def _landmarks() -> dict:
    """Landmark net: mean |err| vs the dataset-mean predictor baseline."""
    from msa_tpu.models.face import (
        FaceLandmarkNet,
        FaceModelConfig,
        load_landmark_weights,
    )
    from msa_tpu.training.train_landmarks import make_template, render_batch

    cfg = FaceModelConfig()
    model = FaceLandmarkNet(cfg)
    params = load_landmark_weights(
        model, resolve_asset("checkpoints/landmark_net.msgpack")
    )
    sample = render_batch(
        np.random.default_rng(777), batch=32, size=cfg.frame_size,
        template=make_template(cfg.landmark_count), p_negative=0.0,
    )
    pred = np.asarray(model.apply({"params": params}, sample.frames)["landmarks"])[
        ..., :2
    ]
    tgt = sample.landmarks[..., :2]
    err = float(np.abs(pred - tgt).mean())
    base = float(np.abs(tgt.mean(axis=0, keepdims=True) - tgt).mean())
    return {
        "mean_abs_err": round(err, 5),
        "mean_predictor_err": round(base, 5),
        "ratio": round(err / base, 4),
        "protocol": "32 rendered faces, seed 777",
        "bar": {"ratio": "<0.1"},
    }


def _face_cnn() -> dict:
    """Face emotion CNN: held-out procedural-expression accuracy."""
    from msa_tpu.models.face import (
        FaceEmotionCNN,
        FaceModelConfig,
        load_emotion_weights,
    )
    from msa_tpu.training import face_synth
    from msa_tpu.training.train_face_emotion import evaluate

    cfg = FaceModelConfig()
    model = FaceEmotionCNN(cfg)
    params = load_emotion_weights(
        model, resolve_asset("checkpoints/face_emotion_cnn.msgpack")
    )
    tmpl = face_synth.make_template(478)
    m = evaluate(model, params, tmpl, n=256, seed=424242)
    # adversarial protocol (VERDICT r4 #5: the in-family number saturates
    # at 1.0): 2x-jitter expressions + occlusion + lighting shifts
    rng = np.random.default_rng(424243)
    crops, labels = face_synth.adversarial_crop_batch(
        rng, 256, crop_size=cfg.crop_size, template=tmpl
    )
    pred = np.asarray(
        jax.jit(lambda p, c: model.apply({"params": p}, c))(params, crops)
    ).argmax(-1)
    adv_acc = float((pred == labels).mean())
    adv_worst = min(
        float((pred[labels == k] == k).mean())
        for k in range(len(face_synth.CLASS_NAMES))
        if (labels == k).any()
    )
    return {
        "accuracy": round(float(m["accuracy"]), 4),
        "worst_class_recall": round(float(m["worst_class_recall"]), 4),
        "adversarial_accuracy": round(adv_acc, 4),
        "adversarial_worst_class_recall": round(adv_worst, 4),
        "protocol": (
            "256 held-out procedural expressions, seed 424242; adversarial: "
            "2x jitter + occlusion + lighting, seed 424243"
        ),
        "bar": {
            "accuracy": ">0.9",
            "worst_class_recall": ">0.7",
            "adversarial_accuracy": ">0.45",
            "adversarial_worst_class_recall": ">0.15",
        },
    }


def _audio_head() -> dict:
    """Audio emotion head: held-out voices + prosody jitter, 4-class."""
    from msa_tpu.models import audio as audio_lib
    from msa_tpu.models.audio import AudioEmotionModel, AudioModelConfig
    from msa_tpu.training.train_audio_emotion import (
        evaluate_head,
        load_head,
        make_dataset,
    )

    model = AudioEmotionModel(AudioModelConfig())
    params = audio_lib.init_params(model, 2, samples=8000)
    head = load_head(resolve_asset("checkpoints/audio_emotion_head.msgpack"))
    waves, labels = make_dataset(np.random.default_rng(515151), 128)
    m = evaluate_head(model, params, head, waves, labels, batch=8)
    return {
        "accuracy": round(float(m["accuracy"]), 4),
        "worst_class_recall": round(float(m["worst_class_recall"]), 4),
        "protocol": "128 fresh voices+prosody, seed 515151",
        "bar": {"accuracy": ">0.55", "worst_class_recall": ">0.35"},
    }


def _text_heads() -> dict:
    """Text heads: held-out word x template compositions, 4 heads."""
    from msa_tpu.models import text as text_lib
    from msa_tpu.models.text import TextModel, TextModelConfig, WordPieceTokenizer
    from msa_tpu.training.train_text_heads import evaluate_heads, load_heads

    cfg = TextModelConfig()
    model = TextModel(cfg)
    params = text_lib.init_params(model, 3)
    tok = WordPieceTokenizer(vocab_size=cfg.vocab_size)
    heads = load_heads(resolve_asset("checkpoints/text_heads.msgpack"))
    m = evaluate_heads(model, params, tok, heads, n=192, seed=9)
    # adversarial protocol (VERDICT r4 #5): same held-out sentences wrapped
    # in OOV pseudo-word context — a number that moves when robustness
    # degrades, unlike the near-saturated in-family accuracies
    adv = evaluate_heads(
        model, params, tok, heads, n=192, seed=9, adversarial=True
    )
    out = {
        k: round(float(m[k]["accuracy"]), 4)
        for k in ("emotion_head", "sentiment_head", "sarcasm_head", "humor_head")
    }
    for k in ("emotion_head", "sentiment_head", "sarcasm_head", "humor_head"):
        out["adversarial_" + k] = round(float(adv[k]["accuracy"]), 4)
    out["protocol"] = (
        "192 held-out word x template sentences, seed 9; adversarial: same "
        "split wrapped in OOV pseudo-word context (text_synth.with_oov_context)"
    )
    out["bar"] = {
        "emotion_head": ">0.55",
        "sentiment_head": ">0.7",
        "sarcasm_head": ">0.85",
        "humor_head": ">0.8",
        # measured on the shipped (unaugmented) heads: 0.38/0.63/0.79/0.53
        # — bars at measured-margin; the OOV-noise training augmentation
        # (train_text_heads, round 5) should lift these on the next retrain
        "adversarial_emotion_head": ">0.3",
        "adversarial_sentiment_head": ">0.5",
        "adversarial_sarcasm_head": ">0.6",
        "adversarial_humor_head": ">0.4",
    }
    return out


def _fusion() -> dict:
    """Fusion MLP: held-out KL vs the 0.4/0.3/0.3 pseudo-label, vs random."""
    import jax.numpy as jnp

    from msa_tpu.models import fusion as fusion_lib

    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests", "data",
        "fusion_eval.json",
    )
    records = json.loads(open(fixture).read())
    face = jnp.asarray([r["face_vec"] for r in records], jnp.float32)
    audio = jnp.asarray([r["audio_vec"] for r in records], jnp.float32)
    text = jnp.asarray([r["text_vec"] for r in records], jnp.float32)
    target = jnp.asarray([r["target"] for r in records], jnp.float32)
    model, params, _ = fusion_lib.load_checkpoint(
        resolve_asset("checkpoints/fusion.msgpack"), create_if_missing=False
    )
    kl, _ = fusion_lib.compute_loss(model, params, face, audio, text, target)
    rand = fusion_lib.init_params(fusion_lib.FusionMLP(), seed=123)
    rkl, _ = fusion_lib.compute_loss(model, rand, face, audio, text, target)
    return {
        "heldout_kl": round(float(kl), 4),
        "random_init_kl": round(float(rkl), 4),
        "ratio": round(float(kl) / float(rkl), 4),
        "protocol": "tests/data/fusion_eval.json heldout split",
        "bar": {"ratio": "<0.55"},
    }


def main() -> int:
    metrics = {}
    for name, fn in (
        ("speaker_embedder", _speaker),
        ("landmark_net", _landmarks),
        ("face_emotion_cnn", _face_cnn),
        ("audio_emotion_head", _audio_head),
        ("text_heads", _text_heads),
        ("fusion", _fusion),
    ):
        print(f"measuring {name} ...", flush=True)
        metrics[name] = fn()
        print(f"  {metrics[name]}", flush=True)
    # the ASR records its own eval.json at save time (train_whisper_asr);
    # mirror it here when present so one file carries the full inventory
    asr_eval = resolve_asset("checkpoints/whisper_asr/eval.json", warn=False)
    if asr_eval and os.path.exists(asr_eval):
        metrics["whisper_asr"] = json.loads(open(asr_eval).read())
        from msa_tpu.host.transcription import SHIPPED_WER_BAR

        metrics["whisper_asr"]["bar"] = {
            "wer": f"<{SHIPPED_WER_BAR} (serve gate)",
            "novel_wer": "<0.55 (generalization, measured+margin)",
        }
    out = resolve_asset("checkpoints/fusion.msgpack").replace(
        "fusion.msgpack", "metrics.json"
    )
    with open(out, "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
