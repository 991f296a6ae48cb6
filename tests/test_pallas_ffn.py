"""Fused FFN Pallas kernel goldens (interpret mode on CPU)."""

import dataclasses

import numpy as np
import pytest

from msa_tpu.ops.pallas.ffn import ffn_fused, ffn_reference


@pytest.mark.parametrize("n,d,f", [(512, 128, 256), (300, 128, 128)])
def test_ffn_matches_reference(rng, n, d, f):
    x = rng.normal(size=(n, d)).astype(np.float32)
    w1 = (rng.normal(size=(d, f)) / np.sqrt(d)).astype(np.float32)
    b1 = rng.normal(size=f).astype(np.float32)
    w2 = (rng.normal(size=(f, d)) / np.sqrt(f)).astype(np.float32)
    b2 = rng.normal(size=d).astype(np.float32)
    got = np.asarray(ffn_fused(x, w1, b1, w2, b2, interpret=True))
    want = np.asarray(ffn_reference(x, w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ffn_block_smaller_than_n(rng):
    """N not a multiple of block_m pads internally and slices back."""
    n, d, f = 200, 128, 128
    x = rng.normal(size=(n, d)).astype(np.float32)
    w1 = (rng.normal(size=(d, f)) / np.sqrt(d)).astype(np.float32)
    b1 = np.zeros(f, np.float32)
    w2 = (rng.normal(size=(f, d)) / np.sqrt(f)).astype(np.float32)
    b2 = np.zeros(d, np.float32)
    got = np.asarray(ffn_fused(x, w1, b1, w2, b2, block_m=128, interpret=True))
    want = np.asarray(ffn_reference(x, w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_encoder_pallas_ffn_matches_dense(rng):
    """ffn_impl='pallas' must agree with the dense path at inference, with
    the SAME params (DenseParams declares identical fc_in/fc_out paths)."""
    import jax

    from msa_tpu.models.transformer import EncoderConfig, TransformerEncoder

    cfg = EncoderConfig(num_layers=2, d_model=128, num_heads=2, d_ff=256)
    x = rng.normal(size=(2, 16, cfg.d_model)).astype(np.float32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 10:] = 0

    enc = TransformerEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), x, mask)["params"]
    enc_pallas = TransformerEncoder(dataclasses.replace(cfg, ffn_impl="pallas"))
    # identical param trees: DenseParams mirrors nn.Dense's kernel/bias
    params_p = enc_pallas.init(jax.random.PRNGKey(0), x, mask)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_p)

    out_d = np.asarray(enc.apply({"params": params}, x, mask))
    out_p = np.asarray(enc_pallas.apply({"params": params}, x, mask))
    np.testing.assert_allclose(out_p, out_d, atol=5e-5)


def test_encoder_pallas_ffn_training_path_differentiable(rng):
    """deterministic=False must route to the dense (autodiff-able) path even
    with ffn_impl='pallas' — gradients flow."""
    import jax
    import jax.numpy as jnp

    from msa_tpu.models.transformer import EncoderConfig, TransformerEncoder

    cfg = EncoderConfig(
        num_layers=1, d_model=128, num_heads=2, d_ff=256, ffn_impl="pallas"
    )
    enc = TransformerEncoder(cfg)
    x = rng.normal(size=(2, 8, cfg.d_model)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        out = enc.apply(
            {"params": p}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
    # fc_in/fc_out gradients are nonzero (the dense path was taken)
    g_fc = grads["layer_0"]["fc_in"]["kernel"]
    assert float(np.abs(np.asarray(g_fc)).max()) > 0


def test_ffn_int8_close_to_f32(rng):
    """W8A8 serving mode: per-channel weight + per-row activation scales keep
    the FFN output within ~2% relative of the f32 path on realistic
    magnitudes (LayerNormed inputs, lecun-scaled weights)."""
    from msa_tpu.ops.pallas.ffn import ffn_fused_int8

    n, d, f = 256, 128, 256
    x = rng.normal(size=(n, d)).astype(np.float32)
    w1 = (rng.normal(size=(d, f)) / np.sqrt(d)).astype(np.float32)
    b1 = (0.1 * rng.normal(size=f)).astype(np.float32)
    w2 = (rng.normal(size=(f, d)) / np.sqrt(f)).astype(np.float32)
    b2 = (0.1 * rng.normal(size=d)).astype(np.float32)
    got = np.asarray(ffn_fused_int8(x, w1, b1, w2, b2, interpret=True))
    want = np.asarray(ffn_reference(x, w1, b1, w2, b2))
    denom = np.maximum(np.abs(want), 1.0)
    rel = np.abs(got - want) / denom
    assert rel.max() < 0.05, rel.max()
    assert np.median(rel) < 0.01, np.median(rel)
