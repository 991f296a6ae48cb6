"""Integrity tests for the repo-shipped trained checkpoints.

The reference's face and speaker capabilities came from pretrained
dependencies (MediaPipe, pyannote) that are not downloadable here; the
rebuild ships small checkpoints trained by its own synthetic-supervision
recipes (training/train_speaker.py, training/train_landmarks.py) so the
neural diarizer and the landmark net are functional out of the box. These
tests pin that the committed assets actually work — they skip if an asset
is absent (e.g. a fresh clone before running the trainers).
"""

import numpy as np
import pytest

from msa_tpu.utils.assets import resolve_asset


def _asset(path):
    import os

    p = resolve_asset(path)
    if not p or not os.path.exists(p):
        pytest.skip(f"shipped asset {path} not present")
    return p


def test_shipped_speaker_embedder_separates_voices(rng):
    """The committed GE2E checkpoint must separate three procedurally
    synthesized voices it has never seen (fresh identities)."""
    path = _asset("checkpoints/speaker_embedder.msgpack")

    from msa_tpu.models.speaker import (
        SpeakerConfig,
        SpeakerEmbeddingNet,
        load_params,
        random_voice,
        synth_voice,
    )

    cfg = SpeakerConfig()
    model = SpeakerEmbeddingNet(cfg)
    params = load_params(model, path)

    voice_rng = np.random.default_rng(987654)
    voices = [random_voice(voice_rng) for _ in range(3)]
    ws = cfg.window_samples
    utts, labels = [], []
    for spk, v in enumerate(voices):
        for _ in range(4):
            utts.append(
                synth_voice(voice_rng, v, cfg.window_seconds, cfg.sample_rate)[:ws]
            )
            labels.append(spk)
    wavs = np.stack(utts)
    embs = np.asarray(model.embed_windows(params, wavs))

    sim = embs @ embs.T
    labels = np.asarray(labels)
    off_diag = ~np.eye(len(labels), dtype=bool)
    same = sim[(labels[:, None] == labels[None, :]) & off_diag]
    diff = sim[labels[:, None] != labels[None, :]]
    assert same.mean() > diff.mean() + 0.2, (same.mean(), diff.mean())


def test_shipped_landmark_net_localizes(rng):
    """The committed landmark checkpoint must place landmarks far closer to
    the synthetic ground truth than the dataset-mean predictor (what the
    round-1 GAP head converged to)."""
    path = _asset("checkpoints/landmark_net.msgpack")

    from msa_tpu.models.face import (
        FaceLandmarkNet,
        FaceModelConfig,
        load_landmark_weights,
    )
    from msa_tpu.training.train_landmarks import make_template, render_batch

    cfg = FaceModelConfig()
    model = FaceLandmarkNet(cfg)
    params = load_landmark_weights(model, path)

    template = make_template(cfg.landmark_count)
    sample = render_batch(
        np.random.default_rng(777), batch=8, size=cfg.frame_size,
        template=template, p_negative=0.0,
    )
    out = model.apply({"params": params}, sample.frames)
    pred = np.asarray(out["landmarks"])[..., :2]
    tgt = sample.landmarks[..., :2]
    err = float(np.abs(pred - tgt).mean())

    mean_pred = tgt.mean(axis=0, keepdims=True)
    base = float(np.abs(mean_pred - tgt).mean())
    assert err < base * 0.5, (err, base)


def test_neural_diarizer_active_with_shipped_checkpoint():
    """make_diarizer('neural', ...) must return the NeuralDiarizer (not a
    fallback) when the shipped checkpoint is present."""
    _asset("checkpoints/speaker_embedder.msgpack")

    from msa_tpu.core.config import DiarizationConfig, ProcessingConfig
    from msa_tpu.host.diarization import NeuralDiarizer, make_diarizer

    d = make_diarizer("neural", ProcessingConfig(), DiarizationConfig(model="neural"))
    assert isinstance(d, NeuralDiarizer)
