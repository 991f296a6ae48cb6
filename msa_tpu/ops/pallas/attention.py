"""Fused multi-head attention — Pallas TPU kernel.

The encoders' attention is the hottest non-matmul-bound op in the pipeline
(BERT trunk: 12 layers × [B, 12, 512, 64]; audio encoder: 250 frames). The
XLA fallback materializes the [B, H, T, T] probability tensor in HBM between
three kernels; this Pallas kernel keeps scores/softmax/context for one query
block entirely in VMEM — one HBM read of Q/K/V, one write of O.

Design (per pallas_guide.md):
- grid (B, H, num_q_blocks); per step: Q block [BQ, D] in VMEM, full K/V
  [T, D] in VMEM (T ≤ 1024 at our shapes → ≤256 KB/head, well under the
  16 MB budget), scores in f32 on the MXU with ``preferred_element_type``.
- key padding handled by an additive −1e9 bias from the [B, T] mask.
- ragged T pads to the 128-lane tile and masks the padded keys, so one
  compiled kernel serves 512-token text and 250-frame audio.

For much longer sequences the kernel should stream K/V blocks with an
online-softmax accumulator (flash attention proper); at T ≤ 512 the single
pass is faster (no rescaling traffic) and numerically identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_LANE = 128  # TPU lane width: last-dim tiles are 128


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [T, D]
    v = v_ref[0, 0]  # [T, D]
    m = mask_ref[0, 0]  # [T]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + jnp.where(m > 0, 0.0, -1e9)[None, :]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray,
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q·kᵀ/√d + mask_bias)·v fused in VMEM.

    q, k, v: [B, H, T, D]; key_mask: [B, T] (1 = attend). Returns [B, H, T, D]
    in q's dtype. T and D are padded to TPU tiles internally.
    """
    b, h, t, d = q.shape
    scale = 1.0 / np.sqrt(d)
    t_pad = _round_up(t, _LANE)
    d_pad = _round_up(d, _LANE)
    bq = min(block_q, t_pad)

    if t_pad != t or d_pad != d:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        key_mask = jnp.pad(key_mask, [(0, 0), (0, t_pad - t)])
    # [B, 1, T]: a (1, 1, T) block satisfies the TPU tiling rule (the
    # second-to-last block dim equals the full array dim)
    key_mask3 = key_mask[:, None, :]

    grid = (b, h, t_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, t_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, t_pad), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)),
        interpret=interpret,
    )(q, k, v, key_mask3)
    return out[:, :, :t, :d]


def reference_attention(q, k, v, key_mask):
    """Plain-XLA reference implementation (for goldens and fallback)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    s = s + jnp.where(key_mask[:, None, None, :] > 0, 0.0, -1e9)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


# --- differentiable wrapper ---------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def attention_with_vjp(q, k, v, key_mask, interpret=False):
    """Pallas forward + analytic backward, so the fused kernel is usable in
    training. The backward recomputes the probability tile in plain XLA
    (standard softmax-attention gradients); a Pallas backward kernel is the
    natural next optimization once training moves beyond the fusion MLP."""
    return fused_attention(q, k, v, key_mask, interpret=interpret)


def _attn_fwd(q, k, v, key_mask, interpret=False):
    out = fused_attention(q, k, v, key_mask, interpret=interpret)
    return out, (q, k, v, key_mask)


def _attn_bwd(interpret, res, g):
    q, k, v, key_mask = res
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    s = s + jnp.where(key_mask[:, None, None, :] > 0, 0.0, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32).astype(v.dtype)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)).astype(k.dtype)
    return dq, dk, dv, jnp.zeros_like(key_mask)


attention_with_vjp.defvjp(_attn_fwd, _attn_bwd)


# --- blockwise flash attention (online softmax) ------------------------------
#
# For long sequences the single-pass kernel above would need the whole K/V in
# VMEM. This variant streams K/V blocks through the grid's innermost
# dimension with the standard running-max/denominator recurrence, so VMEM
# holds one (BQ, BK) tile at a time — the blockwise/ring-ready attention
# SURVEY §5 calls for behind the same encoder interface.


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, m_scr, l_scr, acc_scr, *, scale: float
):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [BK, D]
    v = v_ref[0, 0].astype(jnp.float32)  # [BK, D]
    mask = mask_ref[0, 0]  # [BK]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + jnp.where(mask > 0, 0.0, -1e9)[None, :]  # [BQ, BK]

    m_prev = m_scr[:, :1]  # [BQ, 1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)  # [BQ, BK]
    l_cur = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_cur, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_cur, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blockwise attention with online softmax. Same contract as
    :func:`fused_attention`; VMEM footprint O(BQ·BK) instead of O(BQ·T)."""
    b, h, t, d = q.shape
    scale = 1.0 / np.sqrt(d)
    t_pad = _round_up(t, max(_LANE, block_k))
    d_pad = _round_up(d, _LANE)
    bq = min(block_q, t_pad)
    bk = min(block_k, t_pad)

    if t_pad != t or d_pad != d:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        key_mask = jnp.pad(key_mask, [(0, 0), (0, t_pad - t)])
    key_mask3 = key_mask[:, None, :]

    grid = (b, h, t_pad // bq, t_pad // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANE), jnp.float32) if _HAS_PLTPU else None,
            pltpu.VMEM((bq, _LANE), jnp.float32) if _HAS_PLTPU else None,
            pltpu.VMEM((bq, d_pad), jnp.float32) if _HAS_PLTPU else None,
        ],
        interpret=interpret,
    )(q, k, v, key_mask3)
    return out[:, :, :t, :d]
