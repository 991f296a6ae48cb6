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


# --- tensor / sequence parallel correctness (VERDICT r1 item #2) -------------
#
# The reference has NO tensor or sequence parallelism (SURVEY §2.10); these
# tests validate the rebuild's Megatron-style encoder_param_spec rules and
# token-axis sharding by asserting exact numerical equivalence with the
# unsharded model on a 4x2 (data x model) CPU-emulated mesh.

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def _tp_mesh():
    return mesh_lib.make_mesh(n_data=4, n_model=2)


def _assert_trees_close(a, b, atol=1e-5):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_encoder_param_spec_shards_encoder_kernels():
    """Guard: the spec rules must actually match our encoder param names
    (a silent no-match would make every 'tp' test vacuous)."""
    from msa_tpu.models import text as text_lib

    model = text_lib.TextModel(text_lib.TextModelConfig.tiny())
    params = text_lib.init_params(model, seed=0)
    specs = []
    jax.tree_util.tree_map_with_path(
        lambda path, leaf: specs.append(
            mesh_lib.encoder_param_spec(tuple(str(k.key) for k in path), leaf)
        ),
        params,
    )
    col = sum(1 for s in specs if s == P(None, mesh_lib.MODEL_AXIS))
    row = sum(1 for s in specs if s == P(mesh_lib.MODEL_AXIS, None))
    # per layer: fused qkv + fc_in are column-parallel, attn_out/fc_out row
    assert col >= 4 and row >= 2, (col, row)


def test_tensor_sequence_parallel_text_matches_unsharded():
    """Text trunk forward on a 4x2 mesh — params tp-sharded via
    encoder_param_spec, tokens sp-sharded P(data, model) — must equal the
    unsharded forward to 1e-5."""
    from msa_tpu.models import text as text_lib

    cfg = text_lib.TextModelConfig.tiny()
    model = text_lib.TextModel(cfg)
    params = text_lib.init_params(model, seed=0)
    r = np.random.default_rng(1)
    b, t = 8, 16
    ids = r.integers(0, cfg.vocab_size, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[:, 12:] = 0  # ragged tail exercises masked attention across shards

    fwd = jax.jit(lambda p, i, m: model.apply({"params": p}, i, m))
    ref = jax.tree.map(np.asarray, fwd(params, ids, mask))

    mesh = _tp_mesh()
    sp = NamedSharding(mesh, P(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS))
    params_tp = mesh_lib.shard_encoder_params(mesh, params)
    with mesh:
        out = fwd(params_tp, jax.device_put(ids, sp), jax.device_put(mask, sp))
    _assert_trees_close(out, ref)


def test_tensor_parallel_audio_matches_unsharded():
    """Audio encoder forward with tp-sharded weights + dp-sharded batch."""
    from msa_tpu.models import audio as audio_lib

    cfg = audio_lib.AudioModelConfig.tiny()
    model = audio_lib.AudioEmotionModel(cfg)
    params = audio_lib.init_params(model, seed=0, samples=2000)
    r = np.random.default_rng(2)
    wav = (0.1 * r.normal(size=(8, 2000))).astype(np.float32)

    fwd = jax.jit(lambda p, w: model.apply({"params": p}, w))
    ref = jax.tree.map(np.asarray, fwd(params, wav))

    mesh = _tp_mesh()
    dp = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    params_tp = mesh_lib.shard_encoder_params(mesh, params)
    with mesh:
        out = fwd(params_tp, jax.device_put(wav, dp))
    _assert_trees_close(out, ref)


def test_tensor_parallel_text_grads_match_unsharded():
    """One train-step-style grad through the tp-sharded text trunk equals the
    unsharded grad (XLA inserts the correct collectives for both the forward
    all-reduce and the backward-pass weight-gradient reductions)."""
    from msa_tpu.models import text as text_lib

    cfg = text_lib.TextModelConfig.tiny()
    model = text_lib.TextModel(cfg)
    params = text_lib.init_params(model, seed=0)
    r = np.random.default_rng(3)
    b, t = 8, 16
    ids = r.integers(0, cfg.vocab_size, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    target = r.random((b, 7)).astype(np.float32)
    target /= target.sum(axis=1, keepdims=True)

    def loss_fn(p, i, m, y):
        probs = model.apply({"params": p}, i, m)["emotion_probs"]
        return -jnp.mean(jnp.sum(y * jnp.log(probs + 1e-8), axis=-1))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss_ref, grads_ref = grad_fn(params, ids, mask, target)
    grads_ref = jax.tree.map(np.asarray, grads_ref)

    mesh = _tp_mesh()
    sp = NamedSharding(mesh, P(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS))
    dp = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    params_tp = mesh_lib.shard_encoder_params(mesh, params)
    with mesh:
        loss_tp, grads_tp = grad_fn(
            params_tp,
            jax.device_put(ids, sp),
            jax.device_put(mask, sp),
            jax.device_put(target, dp),
        )
    assert float(loss_ref) == pytest.approx(float(loss_tp), rel=1e-6)
    _assert_trees_close(grads_tp, grads_ref)


def test_full_pipeline_tp_sp_dp_matches_unsharded():
    """The FULL SegmentPipeline forward under dp(batch) + tp(encoder weights)
    + sp(token axis) equals the single-device forward (micro models: this
    validates sharding semantics end-to-end, not capacity)."""
    from msa_tpu.models.audio import AudioModelConfig
    from msa_tpu.models.face import FaceModelConfig
    from msa_tpu.models.fusion import FusionMLP
    from msa_tpu.models.text import TextModelConfig
    from msa_tpu.models.transformer import EncoderConfig
    from msa_tpu.pipeline import graph as graph_lib
    from msa_tpu.pipeline.graph import PipelineModels, SegmentPipeline

    micro = EncoderConfig(num_layers=1, d_model=16, num_heads=2, d_ff=32)
    models = PipelineModels.initialize(
        seed=0,
        face_cfg=FaceModelConfig.tiny(),
        audio_cfg=AudioModelConfig(
            conv_channels=(8, 8), conv_kernels=(10, 8), conv_strides=(5, 4),
            pool_hidden=8, positional="sinusoidal", encoder=micro,
        ),
        text_cfg=TextModelConfig(vocab_size=128, max_positions=64, encoder=micro),
        fusion=FusionMLP(hidden_dim=32),
    )
    pipeline = SegmentPipeline(models, original_frame_hw=(48, 64))
    params = models.params_tree()

    r = np.random.default_rng(4)
    batch, samples, tokens = 8, 2000, 16
    inp = graph_lib.SegmentInputs.zeros(models, batch, samples=samples, tokens=tokens)
    inp.frames = r.integers(0, 255, size=inp.frames.shape, dtype=np.uint8)
    inp.audio = (0.1 * r.normal(size=inp.audio.shape)).astype(np.float32)
    inp.token_ids = r.integers(0, 128, size=inp.token_ids.shape).astype(np.int32)
    inp.token_mask = np.ones_like(inp.token_mask)
    inp.completeness = r.random(batch).astype(np.float32)
    inp.relevance = r.random(batch).astype(np.float32)

    fwd = jax.jit(lambda p, i: pipeline._forward(p, i)[0])
    ref = jax.tree.map(np.asarray, fwd(params, inp))

    mesh = _tp_mesh()
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    sp = NamedSharding(mesh, P(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS))

    def _place_param(path, leaf):
        spec = mesh_lib.encoder_param_spec(tuple(str(k.key) for k in path), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    params_tp = jax.tree_util.tree_map_with_path(_place_param, params)
    field_sh = {f: dp for f in graph_lib._BATCH_FIELDS}
    field_sh["token_ids"] = sp
    field_sh["token_mask"] = sp
    inputs_sh = graph_lib.SegmentInputs(
        **field_sh, **{f: rep for f in graph_lib._CARRY_FIELDS}
    )
    inp_sh = jax.device_put(inp, inputs_sh)
    with mesh:
        out = fwd(params_tp, inp_sh)
    # bf16 never enters these micro configs (f32 default), so 1e-5 holds
    _assert_trees_close(out, ref)


def test_multihost_arg_validation(monkeypatch):
    """Partial multi-host args must fail loudly; no args → single-process."""
    import pytest as _pytest

    from msa_tpu.parallel.distributed import initialize_multihost

    for var in ("MSA_COORDINATOR", "MSA_NUM_PROCESSES", "MSA_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_multihost() is False  # single-process fallback
    with _pytest.raises(ValueError, match="all three"):
        initialize_multihost(coordinator_address="h:1234")
    monkeypatch.setenv("MSA_COORDINATOR", "h:1234")
    monkeypatch.setenv("MSA_NUM_PROCESSES", "2")
    with _pytest.raises(ValueError, match="all three"):
        initialize_multihost()


def test_global_mesh_keeps_model_axis_within_host():
    """global_mesh orders devices host-major so the model axis never spans
    hosts (tp collectives ride ICI, only dp psums cross DCN). On the
    emulated mesh all devices share process 0 — the layout degenerates to
    make_mesh, which is the assertion."""
    import jax

    from msa_tpu.parallel.distributed import global_mesh
    from msa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = global_mesh(n_model=2, devices=jax.devices()[:8])
    assert mesh.shape[DATA_AXIS] == 4 and mesh.shape[MODEL_AXIS] == 2

    class FakeDev:
        def __init__(self, i, pid):
            self.id = i
            self.process_index = pid

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        global_mesh(n_model=2, devices=[FakeDev(0, 0), FakeDev(1, 1), FakeDev(2, 1), FakeDev(3, 1)])
