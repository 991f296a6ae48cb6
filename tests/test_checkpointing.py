"""Whole-pipeline checkpointing + trainer crash-resume tests."""

import json

import numpy as np
import pytest

from msa_tpu.models.fusion import FusionMLP
from msa_tpu.pipeline.checkpoint import load_pipeline, save_pipeline
from msa_tpu.pipeline.graph import PipelineModels, SegmentInputs, SegmentPipeline
from msa_tpu.training.train_fusion import train


def test_pipeline_checkpoint_roundtrip(tmp_path, rng, tiny_models):
    models = tiny_models
    path = str(tmp_path / "pipe.msgpack")
    save_pipeline(path, models)
    restored = load_pipeline(path)

    # identical outputs through the full graph
    inp = SegmentInputs.zeros(models, 1, samples=4000, tokens=16)
    inp.frames = rng.random(inp.frames.shape).astype(np.float32)
    inp.audio = rng.normal(size=inp.audio.shape).astype(np.float32)
    inp.token_ids = rng.integers(0, 128, size=inp.token_ids.shape).astype(np.int32)
    inp.token_mask = np.ones_like(inp.token_mask)
    out_a, _ = SegmentPipeline(models).run(inp)
    out_b, _ = SegmentPipeline(restored).run(inp)
    np.testing.assert_allclose(
        np.asarray(out_a["fused"]), np.asarray(out_b["fused"]), atol=1e-6
    )


def test_pipeline_checkpoint_create_if_missing(tmp_path, monkeypatch):
    # patch initialize to the tiny config so the test stays fast (bind the
    # original to avoid recursion — tiny() itself calls initialize)
    orig = PipelineModels.initialize.__func__
    from msa_tpu.models.audio import AudioModelConfig
    from msa_tpu.models.face import FaceModelConfig
    from msa_tpu.models.text import TextModelConfig

    monkeypatch.setattr(
        PipelineModels,
        "initialize",
        classmethod(
            lambda cls, seed=0, **kw: orig(
                cls,
                seed,
                face_cfg=FaceModelConfig.tiny(),
                audio_cfg=AudioModelConfig.tiny(),
                text_cfg=TextModelConfig.tiny(),
                fusion=FusionMLP(hidden_dim=64),
            )
        ),
    )
    path = tmp_path / "missing" / "pipe.msgpack"
    models = load_pipeline(str(path))
    assert path.exists()
    assert models.fusion.output_dim == 7


def _write_dataset(tmp_path, n=24):
    rng = np.random.default_rng(0)
    recs = []
    for _ in range(n):
        t = rng.random(7)
        recs.append(
            {
                "face_vec": rng.normal(size=27).tolist(),
                "audio_vec": rng.normal(size=31).tolist(),
                "text_vec": rng.normal(size=783).tolist(),
                "target": (t / t.sum()).tolist(),
            }
        )
    for split, lo, hi in (("train", 0, 16), ("val", 16, 24)):
        d = tmp_path / "ami" / split
        d.mkdir(parents=True, exist_ok=True)
        (d / "data.json").write_text(json.dumps(recs[lo:hi]))


def test_trainer_resume_continues(tmp_path):
    _write_dataset(tmp_path)
    model = FusionMLP(hidden_dim=32)
    # run 2 epochs, then resume for 3 more
    train(
        data_dir=str(tmp_path / "ami"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        batch_size=8,
        num_epochs=2,
        model=model,
    )
    assert (tmp_path / "ckpt" / "last_state.msgpack").exists()
    params, history = train(
        data_dir=str(tmp_path / "ami"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        batch_size=8,
        num_epochs=5,
        model=model,
        resume=True,
    )
    # resumed at epoch 2 → only 3 more epochs recorded in this run
    assert len(history["train_loss"]) == 3
    assert np.isfinite(history["train_loss"]).all()
