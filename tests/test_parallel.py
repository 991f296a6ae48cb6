"""Multi-chip sharding tests on the CPU-emulated 8-device mesh
(SURVEY.md §4 item 4 — the reference has no distributed code at all,
SURVEY §2.10; this validates the rebuild's dp path without hardware)."""

import jax
import numpy as np
import pytest

from msa_tpu.models import fusion as fusion_lib
from msa_tpu.parallel import mesh as mesh_lib
from msa_tpu.training import train_fusion as tf


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


def test_make_mesh_shapes():
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = mesh_lib.data_parallel_mesh()
    assert mesh.shape == {"data": 8, "model": 1}


def test_shard_batch_pads_and_places():
    mesh = mesh_lib.data_parallel_mesh()
    x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    with mesh:
        (sx,), real = mesh_lib.shard_batch(mesh, (x,))
    assert real == 10
    assert sx.shape == (16, 3)  # padded to a multiple of 8
    np.testing.assert_array_equal(np.asarray(sx)[:10], x)
    np.testing.assert_array_equal(np.asarray(sx)[10:], 0)


def test_data_parallel_train_step_matches_single_device():
    """The dp-sharded train step must produce the same params as the
    unsharded one (XLA psum ≡ full-batch gradient)."""
    model = fusion_lib.FusionMLP(hidden_dim=64)
    params = fusion_lib.init_params(model, seed=0)
    optimizer = tf.make_optimizer()
    opt_state = optimizer.init(params)
    step = tf.make_train_step(model, optimizer)

    rng = np.random.default_rng(0)
    batch = 16
    face = rng.normal(size=(batch, 27)).astype(np.float32)
    audio = rng.normal(size=(batch, 31)).astype(np.float32)
    text = rng.normal(size=(batch, 783)).astype(np.float32)
    target = rng.random((batch, 7)).astype(np.float32)
    target /= target.sum(axis=1, keepdims=True)
    key = jax.random.PRNGKey(0)

    p_single, _, loss_single = step(params, opt_state, face, audio, text, target, key)

    mesh = mesh_lib.data_parallel_mesh()
    with mesh:
        (sf, sa, st, stg), _ = mesh_lib.shard_batch(mesh, (face, audio, text, target))
        p_shard, _, loss_shard = step(params, opt_state, sf, sa, st, stg, key)

    assert float(loss_single) == pytest.approx(float(loss_shard), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_loop_end_to_end(tmp_path):
    """Tiny end-to-end training run with early stopping + best checkpoint
    (reference train_fusion_model.py:57-136 semantics)."""
    import json

    rng = np.random.default_rng(0)

    def records(n):
        out = []
        for _ in range(n):
            out.append(
                {
                    "face_vec": rng.normal(size=27).tolist(),
                    "audio_vec": rng.normal(size=31).tolist(),
                    "text_vec": rng.normal(size=783).tolist(),
                    "target": (lambda t: (t / t.sum()).tolist())(rng.random(7)),
                }
            )
        return out

    for split, n in (("train", 16), ("val", 8)):
        d = tmp_path / "ami" / split
        d.mkdir(parents=True)
        (d / "data.json").write_text(json.dumps(records(n)))

    model = fusion_lib.FusionMLP(hidden_dim=32)
    params, history = tf.train(
        data_dir=str(tmp_path / "ami"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        batch_size=8,
        num_epochs=2,
        model=model,
    )
    assert len(history["train_loss"]) == 2
    assert np.isfinite(history["train_loss"]).all()
    assert (tmp_path / "ckpt" / "best_model.msgpack").exists()
