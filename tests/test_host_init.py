"""host-side init / restore semantics (msa_tpu.utils.host_init).

The round-3 startup fix moved all eager flax init + checkpoint-restore
templates off the accelerator (230 s → 50 s through the axon tunnel,
BASELINE.md). These tests pin the two contracts that make that safe:

1. bit-identical params — the shipped trained heads were validated against
   trunks drawn by the SAME platform-deterministic PRNG, so ``init_params``
   must return exactly what the raw eager init returns;
2. pjit-compatible placement — on the CPU backend (tests, virtual meshes)
   and on multi-device setups the leaves stay UNCOMMITTED so a mesh can
   shard them next to dp-sharded batches (committed single-device leaves
   made tests/test_checkpointing.py's dp-trainer resume raise
   "incompatible devices").
"""

import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.utils import host_init as HI


def test_execution_platform_honors_default_device():
    assert HI.execution_platform() == jax.devices()[0].platform
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        assert HI.execution_platform() == "cpu"
    assert HI.execution_platform() == jax.devices()[0].platform


def test_init_params_bit_identical_to_raw_init():
    from msa_tpu.models import text as text_lib
    from msa_tpu.models.text import TextModel, TextModelConfig

    cfg = TextModelConfig(
        vocab_size=64,
        max_positions=16,
        encoder=__import__(
            "msa_tpu.models.transformer", fromlist=["EncoderConfig"]
        ).EncoderConfig(num_layers=1, d_model=16, num_heads=2, d_ff=32),
    )
    model = TextModel(cfg)
    via_helper = text_lib.init_params(model, seed=7)
    raw = text_lib._init_host(model, 7)
    for a, b in zip(
        jax.tree_util.tree_leaves(via_helper), jax.tree_util.tree_leaves(raw)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_to_accelerator_keeps_leaves_shardable_under_mesh():
    # on the test backend (CPU, possibly >1 virtual device) leaves must stay
    # uncommitted: an explicit device_put to a mesh sharding and use next to
    # dp-sharded args must work
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    tree = HI.to_accelerator({"w": jnp.ones((8, 4)), "b": np.zeros((4,))})
    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("data",))
    sharded_x = jax.device_put(
        np.ones((len(devs) * 2, 4), np.float32), NamedSharding(mesh, P("data"))
    )

    @jax.jit
    def f(tree, x):
        return x @ tree["w"].T[:4, :] + tree["b"].sum()

    out = f(tree, sharded_x)
    assert np.isfinite(np.asarray(out)).all()


def test_restore_template_via_eval_shape_roundtrips():
    # save → load through the eval_shape template path must reproduce leaves
    import tempfile

    from msa_tpu.models import speaker as spk

    model = spk.SpeakerEmbeddingNet(spk.SpeakerConfig.tiny())
    params = spk.init_params(model, seed=3)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/spk.msgpack"
        spk.save_params(params, path)
        restored = spk.load_params(model, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
