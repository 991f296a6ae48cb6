"""Pallas fused-attention kernel goldens (interpret mode on CPU)."""

import numpy as np
import pytest

from msa_tpu.ops.pallas.attention import fused_attention, reference_attention


@pytest.mark.parametrize("t,d", [(128, 128), (64, 32), (250, 64)])
def test_matches_reference(rng, t, d):
    b, h = 2, 2
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[1, t // 2 :] = 0.0
    got = np.asarray(fused_attention(q, k, v, mask, interpret=True))
    want = np.asarray(reference_attention(q, k, v, mask))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fully_masked_rows_are_finite(rng):
    """A key mask of all zeros must not produce NaNs (softmax over −1e9)."""
    b, h, t, d = 1, 1, 128, 128
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    mask = np.zeros((b, t), np.float32)
    out = np.asarray(fused_attention(q, k, v, mask, interpret=True))
    assert np.isfinite(out).all()


def test_encoder_pallas_impl_matches_einsum(rng):
    """The encoder's pallas attention path must agree with the einsum path
    at inference."""
    import dataclasses

    import jax

    from msa_tpu.models.transformer import EncoderConfig, TransformerEncoder

    cfg = EncoderConfig.tiny()
    x = rng.normal(size=(2, 16, cfg.d_model)).astype(np.float32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 10:] = 0

    enc = TransformerEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), x, mask)["params"]

    enc_pallas = TransformerEncoder(
        dataclasses.replace(cfg, attention_impl="pallas")
    )
    out_e = np.asarray(enc.apply({"params": params}, x, mask))
    out_p = np.asarray(enc_pallas.apply({"params": params}, x, mask))
    np.testing.assert_allclose(out_p, out_e, atol=5e-5)


@pytest.mark.parametrize("t,d,bq,bk", [(256, 64, 128, 128), (300, 32, 128, 128)])
def test_flash_attention_matches_reference(rng, t, d, bq, bk):
    from msa_tpu.ops.pallas.attention import flash_attention

    b, h = 2, 2
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[0, t - 40 :] = 0.0
    got = np.asarray(
        flash_attention(q, k, v, mask, block_q=bq, block_k=bk, interpret=True)
    )
    want = np.asarray(reference_attention(q, k, v, mask))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_flash_attention_long_sequence(rng):
    """Longer-than-VMEM-friendly sequence streams through k blocks."""
    from msa_tpu.ops.pallas.attention import flash_attention

    b, h, t, d = 1, 1, 1024, 64
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    got = np.asarray(flash_attention(q, k, v, mask, interpret=True))
    want = np.asarray(reference_attention(q, k, v, mask))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_attention_vjp_matches_autodiff(rng):
    """Custom VJP gradients == autodiff through the reference XLA path."""
    import jax

    from msa_tpu.ops.pallas.attention import attention_with_vjp

    b, h, t, d = 1, 2, 128, 128
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[0, 100:] = 0.0

    def loss_pallas(q, k, v):
        return jnp_sum(attention_with_vjp(q, k, v, mask, True))

    def loss_ref(q, k, v):
        return jnp_sum(reference_attention(q, k, v, mask))

    import jax.numpy as jnp

    def jnp_sum(x):
        return jnp.sum(x * jnp.arange(d, dtype=jnp.float32))  # non-uniform g

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def _grad_pair(q, k, v, mask):
    """(pallas-bwd grads, reference-autodiff grads) for sum-weighted loss."""
    import jax
    import jax.numpy as jnp

    from msa_tpu.ops.pallas.attention import attention_with_vjp

    d = q.shape[-1]
    w = jnp.arange(d, dtype=jnp.float32) / d  # non-uniform cotangent

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) * w)

    gp = jax.grad(loss(lambda q, k, v: attention_with_vjp(q, k, v, mask, True)),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda q, k, v: reference_attention(q, k, v, mask)),
                  argnums=(0, 1, 2))(q, k, v)
    return gp, gr


def test_pallas_backward_ragged_t_masked_keys(rng):
    """Flash-style Pallas backward (VERDICT r1 #8): ragged T (pads to the
    lane tile) + masked key tail must match autodiff exactly in f32."""
    b, h, t, d = 2, 2, 250, 64
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[1, 200:] = 0.0
    gp, gr = _grad_pair(q, k, v, mask)
    for name, a, b_ in zip("qkv", gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, err_msg=f"d{name}"
        )


def test_pallas_backward_bf16(rng):
    """bf16 operands: the backward accumulates in f32 scratch, so grads track
    the f32 reference within bf16 resolution."""
    b, h, t, d = 1, 2, 128, 64
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    import jax.numpy as jnp

    gp, _ = _grad_pair(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), mask
    )
    _, gr = _grad_pair(q, k, v, mask)
    for name, a, b_ in zip("qkv", gp, gr):
        assert a.dtype == jnp.bfloat16  # grads come back in the operand dtype
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b_, np.float32),
            atol=5e-2,
            rtol=5e-2,
            err_msg=f"d{name}",
        )


def test_pallas_backward_long_t_flash_forward(rng):
    """T > single-pass budget routes the forward through the blockwise
    online-softmax kernel; its lse feeds the same backward."""
    b, h, t, d = 1, 1, 640, 32
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[0, 600:] = 0.0
    gp, gr = _grad_pair(q, k, v, mask)
    for name, a, b_ in zip("qkv", gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-4, err_msg=f"d{name}"
        )
