"""Phonetic speech synthesis + ASR training recipe (training.speech_synth,
training.train_whisper_asr).

Reference capability: transcription via openai/whisper-medium was the intent
(reference src/config/config.py:75-79, broken per defect D3); the rebuild
trains its TPU-native Whisper on procedural phonetic speech instead.
"""

import numpy as np
import pytest

from msa_tpu.training import speech_synth as S
from msa_tpu.training import train_whisper_asr as T
from msa_tpu.models.speaker import random_voice


def test_g2p_deterministic_and_digraphs():
    a = S.word_to_phones("assustado")
    b = S.word_to_phones("assustado")
    assert [p.kind for p in a] == [p.kind for p in b]
    # ss → one fricative, not two
    assert [p.kind for p in S.word_to_phones("assa")] == ["vowel", "fric", "vowel"]
    # nh/lh/ch digraphs collapse to single phones
    assert [p.kind for p in S.word_to_phones("chato")][0] == "fric"
    assert len(S.word_to_phones("nha")) == 2
    # silent h, soft c before e/i
    assert [p.kind for p in S.word_to_phones("hoje")][0] == "vowel"
    cidade = S.word_to_phones("cidade")
    assert cidade[0].kind == "fric" and cidade[0].band == "high"  # c+i → s
    # initial r is the strong rhotic, medial r the tap
    assert S.word_to_phones("raiva")[0].kind == "fric"
    assert any(p.kind == "tap" for p in S.word_to_phones("caro"))


def _spectral_stats(seed: int, text: str):
    """(high-band energy fraction, voiced spectral centroid) of one clip."""
    rng = np.random.default_rng(seed)
    v = random_voice(rng)
    x = S.synth_utterance(rng, v, text)
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / 16_000)
    high = spec[freqs >= 4000].sum() / (spec.sum() + 1e-12)
    centroid = float((freqs * spec).sum() / (spec.sum() + 1e-12))
    return float(high), centroid


def test_utterance_audio_is_phone_dependent():
    """Phone identity must be acoustically recoverable across voices — the
    property that makes phonetic ASR learnable: sibilant words carry more
    high-band energy than nasal words; /i/ words have a higher spectral
    centroid than /u/ words (F2 2250 vs 750 Hz targets)."""
    for seed in range(3):
        s_high, _ = _spectral_stats(seed, "sossa")  # s-heavy
        m_high, _ = _spectral_stats(seed, "mano")  # nasal-heavy
        assert s_high > 2 * m_high, (seed, s_high, m_high)
        _, c_i = _spectral_stats(seed + 10, "vivi")
        _, c_u = _spectral_stats(seed + 10, "vuvu")
        assert c_i > c_u, (seed, c_i, c_u)


def test_encode_targets_roundtrip():
    cfg = T.asr_config()
    tok = T.make_tokenizer()
    texts = ["feliz hoje", "estou tão triste", "coração"]
    tokens, n_real = T.encode_targets(tok, texts, cfg)
    for i, text in enumerate(texts):
        row = tokens[i]
        assert row[0] == cfg.decoder_start_token_id
        nb = int(n_real[i]) - 1  # bytes (n_real counts bytes + eos)
        assert row[1 + nb] == cfg.eos_token_id
        assert tok.decode([int(t) for t in row[1 : 1 + nb]]) == text
        assert nb == len(text.encode("utf-8"))


def test_wer():
    assert T.word_error_rate(["a", "b"], ["a", "b"]) == 0.0
    assert T.word_error_rate(["a", "b"], ["a"]) == pytest.approx(0.5)
    assert T.word_error_rate(["a"], ["b", "a"]) == pytest.approx(1.0)


@pytest.fixture(scope="module")
def tiny_asr_cfg():
    from msa_tpu.models.whisper import WhisperConfig

    return WhisperConfig(
        n_mels=16,
        d_model=32,
        encoder_layers=1,
        decoder_layers=1,
        num_heads=2,
        d_ff=64,
        vocab_size=512,
        max_source_positions=50,  # 1 s window
        max_target_positions=24,
        eos_token_id=1,
        decoder_start_token_id=2,
    )


def test_training_step_learns(tiny_asr_cfg):
    """A short run on a tiny config decreases the teacher-forced CE —
    validates the on-the-fly stream (knots → device render → mel → step),
    masking, and the step function."""
    model, params, history = T.train(
        steps=30, batch=8, lr=1e-3, seed=0, log_every=0, cfg=tiny_asr_cfg,
        eval_every=0,
    )
    early = np.mean(history["loss"][:5])
    late = np.mean(history["loss"][-5:])
    assert late < early, (early, late)
    assert np.isfinite(history["loss"]).all()


def test_device_render_matches_numpy_distribution():
    """The device renderer (training data) must produce the same acoustics
    as the numpy path (held-out eval data): matched phone-dependent spectral
    statistics for the same text, and make_clip-compatible peak level."""
    import jax
    import jax.numpy as jnp

    from msa_tpu.models.speaker import random_voice
    from msa_tpu.training import speech_synth as S

    window = 24_000
    rng = np.random.default_rng(5)

    def stats(x):
        spec = np.abs(np.fft.rfft(x)) ** 2
        freqs = np.fft.rfftfreq(len(x), 1 / 16_000)
        high = spec[freqs >= 4000].sum() / (spec.sum() + 1e-12)
        centroid = float((freqs * spec).sum() / (spec.sum() + 1e-12))
        return float(high), centroid

    v1, v2 = random_voice(rng), random_voice(rng)
    clips = [
        S.utterance_knots(rng, v, text, window)
        for v, text in ((v1, "sossa"), (v1, "mano"), (v2, "vivi"), (v2, "vuvu"))
    ]
    batch = {k: jnp.asarray(v) for k, v in S.stack_knots(clips).items()}
    out = np.asarray(
        jax.jit(lambda kn, key: S.render_knots_batch(kn, key, window))(
            batch, jax.random.PRNGKey(0)
        )
    )
    assert out.shape == (4, window) and np.isfinite(out).all()
    # peak ≈ 0.3·energy, as synth_utterance normalizes
    assert np.all(np.abs(out).max(axis=1) < 0.7)
    s_high, _ = stats(out[0])
    m_high, _ = stats(out[1])
    assert s_high > 2 * m_high, (s_high, m_high)  # sibilant ≫ nasal high-band
    _, c_i = stats(out[2])
    _, c_u = stats(out[3])
    assert c_i > c_u, (c_i, c_u)  # /i/ centroid above /u/


def test_make_clip_static_window():
    cfg = T.asr_config()
    from msa_tpu.models.whisper import window_samples

    rng = np.random.default_rng(0)
    wav, text = T.make_clip(rng, T.TRAIN_WORDS, window_samples(cfg))
    assert wav.shape == (window_samples(cfg),)
    assert wav.dtype == np.float32
    assert 2 <= len(text.split()) <= 4
    assert len(text.encode("utf-8")) <= cfg.max_target_positions - 2


def test_random_word_renderable_and_heldout_clean():
    """Pseudo-words must be lowercase ASCII the synthesizer can render, never
    a held-out NOVEL_WORDS entry (eval leakage), and sample_text's
    pseudo_frac mixture must actually draw them."""
    rng = np.random.default_rng(0)
    for _ in range(300):
        w = T.random_word(rng)
        assert w == w.lower() and w.isascii(), w
        assert w not in T.NOVEL_WORDS, w
        assert len(S.word_to_phones(w)) >= 2, w
    text = T.sample_text(rng, T.TRAIN_WORDS, pseudo_frac=1.0)
    assert all(w not in T.TRAIN_WORDS for w in text.split()), text


def test_probe_save_and_early_stop(tiny_asr_cfg, tmp_path, monkeypatch):
    """A mid-training probe that clears the serve bars persists the full
    gated artifact (params + config + eval.json + history.json) immediately,
    and a strong pass ends the run early — an interrupted retrain still
    leaves a shippable, recorded checkpoint."""
    import json

    def fake_eval(model, params, cfg, rng, pool, n=48):
        return {"wer": 0.0, "exact": 1.0, "n": n}

    monkeypatch.setattr(T, "evaluate", fake_eval)
    model, params, history = T.train(
        steps=6, batch=2, lr=1e-3, seed=0, log_every=0, cfg=tiny_asr_cfg,
        eval_every=2, out_dir=str(tmp_path),
    )
    for name in ("params.msgpack", "config.json", "eval.json", "history.json"):
        assert (tmp_path / name).exists(), name
    rec = json.loads((tmp_path / "eval.json").read_text())
    assert rec["wer"] == 0.0 and rec["novel_wer"] == 0.0
    assert len(history["loss"]) < 6  # stopped at the first (passing) probe
