"""Core taxonomy/config/schema tests."""

import dataclasses
import os

import numpy as np
import pytest

from msa_tpu.core import emotions
from msa_tpu.core.config import SystemConfig
from msa_tpu.core.schema import EMPTY_STREAMING_OUTPUT, build_streaming_output


def test_label_adapters_roundtrip(rng):
    probs = rng.random(7)
    canonical = emotions.reorder_np(probs, emotions.DEEPFACE_TO_CANONICAL)
    back = emotions.reorder_np(canonical, emotions.CANONICAL_TO_DEEPFACE)
    np.testing.assert_array_equal(back, probs)


def test_deepface_order_mapping():
    """DeepFace 'angry' slot → canonical 'angry' slot (face_analyzer.py:
    164-172 vs emotions.py:11-17)."""
    probs = np.zeros(7)
    probs[emotions.DEEPFACE.index("angry")] = 1.0
    canonical = emotions.reorder_np(probs, emotions.DEEPFACE_TO_CANONICAL)
    assert canonical[emotions.CANONICAL.index("angry")] == 1.0


def test_pt_ui_mapping():
    probs = np.zeros(7)
    probs[emotions.CANONICAL.index("fearful")] = 1.0
    pt = emotions.reorder_np(probs, emotions.CANONICAL_TO_PT_UI)
    assert pt[emotions.PT_UI.index("medo")] == 1.0


def test_duplicate_4_to_8_sums_to_one(rng):
    p4 = rng.random((2, 4))
    p4 /= p4.sum(axis=1, keepdims=True)
    p8 = np.asarray(emotions.duplicate_4_to_8(p4))
    np.testing.assert_allclose(p8.sum(axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose(p8[:, :4], p8[:, 4:], atol=1e-7)


def test_config_env_overrides(monkeypatch):
    monkeypatch.setenv("HF_TOKEN", "tok123")
    monkeypatch.setenv("MODEL_DEVICE", "cpu")
    monkeypatch.setenv("MSA_MODEL_SCALE", "tiny")
    cfg = SystemConfig.from_env()
    assert cfg.model.hf_token == "tok123"
    assert cfg.model.device == "cpu"
    assert cfg.pipeline.model_scale == "tiny"


def test_config_is_frozen():
    cfg = SystemConfig()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.processing.segment_duration = 10.0  # type: ignore[misc]


def test_empty_streaming_output_schema():
    """The reference failure dict (streaming_processor.py:374-377)."""
    assert set(EMPTY_STREAMING_OUTPUT) == {
        "face",
        "audio",
        "text",
        "fused_emotion",
        "weights",
        "speaker_id",
    }
    assert all(v is None for v in EMPTY_STREAMING_OUTPUT.values())


def test_build_streaming_output_all_none():
    out = build_streaming_output(None, None, None, None, None, None)
    assert out["face"] is None and out["audio"] is None and out["text"] is None
    assert out["fused_emotion"] is None


def test_precompile_resolves_by_model_scale():
    """None → precompile iff full-scale (library users must not pay a cold
    first-window compile, VERDICT r2 #9); an explicit value always wins."""
    from msa_tpu.core.config import PipelineConfig

    assert PipelineConfig(model_scale="full").should_precompile() is True
    assert PipelineConfig(model_scale="tiny").should_precompile() is False
    assert (
        PipelineConfig(model_scale="full", precompile=False).should_precompile()
        is False
    )
    assert (
        PipelineConfig(model_scale="tiny", precompile=True).should_precompile()
        is True
    )
