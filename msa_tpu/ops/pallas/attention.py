"""Fused multi-head attention — Pallas TPU kernels (forward + backward).

The encoders' attention is the hottest non-matmul-bound op in the pipeline
(BERT trunk: 12 layers × [B, 12, 512, 64]; audio encoder: 250 frames). The
XLA fallback materializes the [B, H, T, T] probability tensor in HBM between
three kernels; these Pallas kernels keep scores/softmax/context for one query
block entirely in VMEM — one HBM read of Q/K/V, one write of O.

Design (per pallas_guide.md):
- grid (B, H, num_q_blocks); per step: Q block [BQ, D] in VMEM, full K/V
  [T, D] in VMEM (T ≤ 1024 at our shapes → ≤256 KB/head, well under the
  16 MB budget), scores in f32 on the MXU with ``preferred_element_type``.
- key padding handled by an additive −1e9 bias from the [B, T] mask.
- ragged T pads to the 128-lane tile and masks the padded keys, so one
  compiled kernel serves 512-token text and 250-frame audio.
- row statistics (logsumexp) are emitted as a [B, H, 1, T] side output so the
  backward never re-runs the softmax reduction.

Backward (flash-style, VERDICT r1 #8): with L = rowwise logsumexp and
Δ = rowsum(dO ∘ O), the standard gradients are
    P  = exp(S − L),     dV = Pᵀ·dO,
    dS = P ∘ (dO·Vᵀ − Δ),  dQ = scale·dS·K,  dK = scale·dSᵀ·Q.
Two kernels: ``_bwd_dq_kernel`` streams K/V blocks per Q block; l
``_bwd_dkv_kernel`` streams Q/dO blocks per K/V block. Both recompute the
P tile in VMEM (never materialized in HBM).

For sequences beyond the single-pass VMEM budget the blockwise
:func:`flash_attention` (online softmax) takes over; the differentiable
wrapper :func:`attention_with_vjp` picks per T and shares the same backward.
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

# T up to this bound runs the single-pass kernel (full K/V per head in VMEM);
# longer sequences stream K/V blockwise with the online-softmax kernel.
_SINGLE_PASS_MAX_T = 512


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale: float):
    # dots run on the NATIVE dtype (bf16 inputs → full-rate bf16 MXU) with
    # f32 accumulation via preferred_element_type; softmax stays f32
    q = q_ref[0, 0]  # [BQ, D]
    k = k_ref[0, 0]  # [T, D]
    v = v_ref[0, 0]  # [T, D]
    m = mask_ref[0, 0]  # [T]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + jnp.where(m > 0, 0.0, -1e9)[None, :]
    smax = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - smax)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0, 0] = (smax[:, 0] + jnp.log(denom[:, 0])).astype(lse_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mha_kernel(
    q_ref, kt_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale: float, num_heads: int
):
    """All heads of one (batch, q-block) pair per grid step.

    Two measured pathologies of the per-head kernel above at production
    shapes (B=64, H=12, T=512) motivate this one (4.2 ms → ~1 ms/layer):

    1. K arrives TRANSPOSED ([D, T]): ``q·kᵀ`` as a lane×lane contraction
       (both operands' contracting dim minormost) forces Mosaic to transpose
       K inside the kernel — measured 2.9 ms of the 5.2 ms step. With kᵀ the
       score dot contracts q's lane dim against kᵀ's sublane dim, the
       native MXU form (like an activations×weights matmul).
    2. the (B, H, T/BQ) grid runs 1536 steps whose fixed cost dominates the
       ~67 MFLOP each; folding the head loop INTO the kernel cuts the grid
       to (B, T/BQ) = 128 steps of ~0.8 GFLOP. The loop is a static Python
       unroll over leading-dim slices (no lane slicing), and one head's
       scores die before the next head's are computed, so VMEM stays
       bounded."""
    m = mask_ref[0, 0]  # [T]
    bias = jnp.where(m > 0, 0.0, -1e9)[None, :]
    for h in range(num_heads):
        q = q_ref[0, h]  # [BQ, D]
        kt = kt_ref[0, h]  # [D, T]
        v = v_ref[0, h]  # [T, D]
        s = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias
        smax = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - smax)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / denom).astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = o.astype(o_ref.dtype)
        lse_ref[0, h, 0] = (smax[:, 0] + jnp.log(denom[:, 0])).astype(lse_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _mha_attention_lse(q, k, v, key_mask, block_q: int = 256, interpret: bool = False):
    """Single-pass fused attention, all heads per grid step → (o, lse).

    Same contract as :func:`_fused_attention_lse` ([B, H, T, D] in, [B, H, T,
    D] + [B, H, T] out); head_dim stays unpadded (see pad_d note there). K is
    transposed to [B, H, D, T] in XLA (one fast HBM copy) so the score dot
    runs in the native MXU orientation — see :func:`_mha_kernel`."""
    b, h, t, d = q.shape
    scale = 1.0 / np.sqrt(d)
    t_pad = _round_up(t, _LANE)
    d_pad = _round_up(d, 64)
    bq = min(block_q, t_pad)
    while t_pad % bq:
        bq //= 2
    q, k, v, key_mask = _pad_qkvm(q, k, v, key_mask, t_pad, d_pad)
    kt = k.transpose(0, 1, 3, 2)  # [B, H, D, T]
    key_mask3 = key_mask[:, None, :]

    grid = (b, t_pad // bq)
    out, lse = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, num_heads=h),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, t_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, bq, d_pad), lambda bi, qi: (bi, 0, qi, 0)),
            pl.BlockSpec((1, h, d_pad, t_pad), lambda bi, qi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, h, t_pad, d_pad), lambda bi, qi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, 1, t_pad), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, h, bq, d_pad), lambda bi, qi: (bi, 0, qi, 0)),
            pl.BlockSpec((1, h, 1, bq), lambda bi, qi: (bi, 0, 0, qi)),
        ),
        interpret=interpret,
    )(q, kt, v, key_mask3)
    return out[:, :, :t, :d], lse[:, :, 0, :t]


def _pad_qkvm(q, k, v, key_mask, t_pad, d_pad):
    t, d = q.shape[2], q.shape[3]
    if t_pad != t or d_pad != d:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        key_mask = jnp.pad(key_mask, [(0, 0), (0, t_pad - t)])
    return q, k, v, key_mask


@functools.partial(jax.jit, static_argnames=("block_q", "interpret", "pad_d"))
def _fused_attention_lse(
    q, k, v, key_mask, block_q: int = 256, interpret: bool = False, pad_d: bool = False
):
    """Single-pass fused attention → (o [B,H,T,D], lse [B,H,T]).

    ``pad_d=False`` keeps head_dim-64 blocks unpadded: Mosaic packs the
    64-wide minormost dim into (…,128) VMEM tiles internally, which wastes
    half the VMEM tile but avoids THREE full HBM pad copies of Q/K/V (and
    halves the kernel's K/V read traffic) — measured faster end to end."""
    b, h, t, d = q.shape
    scale = 1.0 / np.sqrt(d)
    t_pad = _round_up(t, _LANE)
    d_pad = _round_up(d, _LANE) if pad_d else _round_up(d, 64)
    bq = min(block_q, t_pad)
    while t_pad % bq:  # the grid needs bq | t_pad (e.g. t_pad=384, bq=256)
        bq //= 2
    q, k, v, key_mask = _pad_qkvm(q, k, v, key_mask, t_pad, d_pad)
    # [B, 1, T]: a (1, 1, T) block satisfies the TPU tiling rule (the
    # second-to-last block dim equals the full array dim)
    key_mask3 = key_mask[:, None, :]

    grid = (b, h, t_pad // bq)
    out, lse = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, t_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, t_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, t_pad), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi: (bi, hi, 0, qi)),
        ),
        interpret=interpret,
    )(q, k, v, key_mask3)
    return out[:, :, :t, :d], lse[:, :, 0, :t]


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray,
    block_q: int = 256,  # measured fastest for T=512 on v5e (vs 128/512)
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q·kᵀ/√d + mask_bias)·v fused in VMEM.

    q, k, v: [B, H, T, D]; key_mask: [B, T] (1 = attend). Returns [B, H, T, D]
    in q's dtype. T and D are padded to TPU tiles internally.
    """
    return _fused_attention_lse(q, k, v, key_mask, block_q, interpret)[0]


def reference_attention(q, k, v, key_mask):
    """Plain-XLA reference implementation (for goldens and fallback)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    s = s + jnp.where(key_mask[:, None, None, :] > 0, 0.0, -1e9)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


# --- flash-style backward kernels ---------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, mask_ref, dq_ref, acc_scr,
    *, scale: float,
):
    """dQ = scale · Σ_k [P ∘ (dO·Vᵀ − Δ)]·K — K/V stream over the innermost
    grid dim, accumulator in VMEM."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # [BQ, D]
    k = k_ref[0, 0]  # [BK, D]
    v = v_ref[0, 0]  # [BK, D]
    g = g_ref[0, 0]  # [BQ, D]
    lse = lse_ref[0, 0, 0]  # [BQ]
    delta = delta_ref[0, 0, 0]  # [BQ]
    m = mask_ref[0, 0]  # [BK]

    s = jax.lax.dot_general(  # native-dtype MXU dot, f32 accumulation
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + jnp.where(m > 0, 0.0, -1e9)[None, :]
    p = jnp.exp(s - lse[:, None])  # [BQ, BK] f32
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta[:, None])
    acc_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = (acc_scr[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    k_ref, v_ref, q_ref, g_ref, lse_ref, delta_ref, mask_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale: float,
):
    """dV = Σ_q Pᵀ·dO;  dK = scale · Σ_q [P ∘ (dO·Vᵀ − Δ)]ᵀ·Q — Q/dO stream
    over the innermost grid dim."""
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k = k_ref[0, 0]  # [BK, D]
    v = v_ref[0, 0]  # [BK, D]
    q = q_ref[0, 0]  # [BQ, D]
    g = g_ref[0, 0]  # [BQ, D]
    lse = lse_ref[0, 0, 0]  # [BQ]
    delta = delta_ref[0, 0, 0]  # [BQ]
    m = mask_ref[0, 0]  # [BK]

    st = jax.lax.dot_general(  # Sᵀ: [BK, BQ]; native-dtype MXU, f32 accum
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    st = st * scale + jnp.where(m > 0, 0.0, -1e9)[:, None]
    pt = jnp.exp(st - lse[None, :])  # Pᵀ [BK, BQ] f32
    dv_scr[:] += jax.lax.dot_general(
        pt.astype(g.dtype), g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpt = jax.lax.dot_general(  # (dO·Vᵀ)ᵀ = V·dOᵀ: [BK, BQ]
        v, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dst = pt * (dpt - delta[None, :])
    dk_scr[:] += jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_scr[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def attention_bwd(
    q, k, v, key_mask, lse, o, g,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
):
    """Flash-style Pallas backward. Inputs are the UNPADDED forward operands,
    the forward output ``o`` and row logsumexp ``lse``; returns (dq, dk, dv)
    in the operands' dtypes. The P tile is recomputed in VMEM from (q, k,
    lse) — never materialized in HBM (VERDICT r1 #8)."""
    b, h, t, d = q.shape
    scale = 1.0 / np.sqrt(d)
    t_pad = _round_up(t, max(_LANE, block_q, block_k))
    d_pad = _round_up(d, _LANE)
    bq = min(block_q, t_pad)
    bk = min(block_k, t_pad)

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [B,H,T]

    qp, kp, vp, maskp = _pad_qkvm(q, k, v, key_mask, t_pad, d_pad)
    pad_t = t_pad - t
    gp = jnp.pad(g, [(0, 0), (0, 0), (0, pad_t), (0, d_pad - d)])
    lse4 = jnp.pad(lse, [(0, 0), (0, 0), (0, pad_t)])[:, :, None, :]
    delta4 = jnp.pad(delta, [(0, 0), (0, 0), (0, pad_t)])[:, :, None, :]
    mask3 = maskp[:, None, :]

    row4 = lambda: pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi, ki: (bi, hi, 0, qi))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d_pad), q.dtype),
        grid=(b, h, t_pad // bq, t_pad // bk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            row4(),
            row4(),
            pl.BlockSpec((1, 1, bk), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d_pad), jnp.float32) if _HAS_PLTPU else None
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lse4, delta4, mask3)

    row4kv = lambda: pl.BlockSpec(
        (1, 1, 1, bq), lambda bi, hi, ki, qi: (bi, hi, 0, qi)
    )
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b, h, t_pad, d_pad), v.dtype),
        ),
        grid=(b, h, t_pad // bk, t_pad // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
            row4kv(),
            row4kv(),
            pl.BlockSpec((1, 1, bk), lambda bi, hi, ki, qi: (bi, 0, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d_pad), jnp.float32) if _HAS_PLTPU else None,
            pltpu.VMEM((bk, d_pad), jnp.float32) if _HAS_PLTPU else None,
        ],
        interpret=interpret,
    )(kp, vp, qp, gp, lse4, delta4, mask3)

    return dq[:, :, :t, :d], dk[:, :, :t, :d], dv[:, :, :t, :d]


def _packed_qkv_kernel(
    q_ref, kt_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale: float, num_heads: int
):
    """Like :func:`_mha_kernel`, but Q and V are read STRAIGHT from the fused
    QKV projection's [B, T, 3, H, D] output (their BlockSpec index maps pin
    the qkv axis), so the DMA engine does the de-interleave — XLA never
    materializes sliced/transposed Q or V copies. Only K needs a real HBM
    transpose (to [B, H, D, T]) for the MXU-native score dot."""
    m = mask_ref[0, 0]  # [T]
    bias = jnp.where(m > 0, 0.0, -1e9)[None, :]
    qs = q_ref[...][0, :, 0]  # [BQ, H, D]
    vs = v_ref[...][0, :, 0]  # [T, H, D]
    outs = []
    lses = []
    for h in range(num_heads):
        q = qs[:, h]  # [BQ, D]
        kt = kt_ref[0, h]  # [D, T]
        v = vs[:, h]  # [T, D]
        s = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias
        smax = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - smax)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / denom).astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(o_ref.dtype))
        lse_ref[0, h, 0] = (smax[:, 0] + jnp.log(denom[:, 0])).astype(lse_ref.dtype)
    # heads concatenate on the LANE dim (supported by Mosaic; per-head
    # strided stores are not) → one [BQ, H·D] store, already in the layout
    # the attn_out projection consumes
    o_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _packed_qkv_attention_lse(
    qkv, key_mask, block_q: int = 256, interpret: bool = False
):
    """Attention on the fused projection output, minimal layout traffic.

    qkv: [B, T, 3, H, D] (a free reshape of the [B, T, 3·H·D] dense output).
    Returns (o [B, T, H·D], lse [B, H, T]). The only materialized layout op
    is K → [B, H, D, T]; Q and V stream from ``qkv`` directly via index-map
    pinning (the same array is passed twice with different BlockSpecs), and
    the output lands in the exact layout the attn_out projection consumes."""
    b, t, three, h, d = qkv.shape
    assert three == 3
    scale = 1.0 / np.sqrt(d)
    t_pad = _round_up(t, _LANE)
    bq = min(block_q, t_pad)
    while t_pad % bq:
        bq //= 2
    if t_pad != t:
        qkv = jnp.pad(qkv, [(0, 0), (0, t_pad - t), (0, 0), (0, 0), (0, 0)])
        key_mask = jnp.pad(key_mask, [(0, 0), (0, t_pad - t)])
    kt = qkv[:, :, 1].transpose(0, 2, 3, 1)  # [B, H, D, T] — the one copy
    key_mask3 = key_mask[:, None, :]

    grid = (b, t_pad // bq)
    out, lse = pl.pallas_call(
        functools.partial(_packed_qkv_kernel, scale=scale, num_heads=h),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, h * d), qkv.dtype),
            jax.ShapeDtypeStruct((b, h, 1, t_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 1, h, d), lambda bi, qi: (bi, qi, 0, 0, 0)),
            pl.BlockSpec((1, h, d, t_pad), lambda bi, qi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, t_pad, 1, h, d), lambda bi, qi: (bi, 0, 2, 0, 0)),
            pl.BlockSpec((1, 1, t_pad), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, h * d), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, h, 1, bq), lambda bi, qi: (bi, 0, 0, qi)),
        ),
        interpret=interpret,
    )(qkv, kt, qkv, key_mask3)
    return out[:, :t], lse[:, :, 0, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def packed_qkv_attention(qkv, key_mask, interpret=False):
    """Differentiable attention on the fused QKV projection output.

    qkv: [B, T, 3, H, D] → o [B, T, H·D]. Forward is the packed-layout
    kernel; the backward transposes to the [B, H, T, D] convention and reuses
    the flash-style Pallas backward (:func:`attention_bwd`), scattering the
    grads back into the packed layout (training pays the transposes; the
    inference hot path pays only the K one)."""
    return _packed_qkv_attention_lse(qkv, key_mask, interpret=interpret)[0]


def _packed_fwd(qkv, key_mask, interpret=False):
    out, lse = _packed_qkv_attention_lse(qkv, key_mask, interpret=interpret)
    return out, (qkv, key_mask, lse, out)


def _packed_bwd(interpret, res, g):
    qkv, key_mask, lse, o = res
    b, t, _, h, d = qkv.shape
    to4 = lambda x: x.reshape(b, t, h, d).transpose(0, 2, 1, 3)  # noqa: E731
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    dq, dk, dv = attention_bwd(
        q, k, v, key_mask, lse, to4(o), to4(g), interpret=interpret
    )
    dqkv = jnp.stack([dq, dk, dv], axis=1).transpose(0, 3, 1, 2, 4)
    return dqkv, jnp.zeros_like(key_mask)


packed_qkv_attention.defvjp(_packed_fwd, _packed_bwd)


def _attn_block_kernel(
    x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref, bo_ref,
    mask_ref, o_ref, *, scale: float, num_heads: int,
):
    _attn_block_body(
        x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref, bo_ref,
        None, None, None, None, mask_ref, o_ref, scale=scale,
        num_heads=num_heads, int8=False,
    )


def _attn_block_int8_kernel(
    x_ref, xs_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref,
    bo_ref, sq_ref, sk_ref, sv_ref, so_ref, mask_ref, o_ref,
    *, scale: float, num_heads: int,
):
    _attn_block_body(
        x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref, bo_ref,
        sq_ref, sk_ref, sv_ref, so_ref, mask_ref, o_ref, scale=scale,
        num_heads=num_heads, int8=True, xs_ref=xs_ref,
    )


def _quant_rows(xf):
    """Per-row symmetric int8: (x_i8, row_scale [T, 1] f32). One shared
    recipe for all W8A8 kernels — see msa_tpu.ops.quant."""
    from msa_tpu.ops.quant import quantize_rows

    return quantize_rows(xf)


def _attn_block_body(
    x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref, bo_ref,
    sq_ref, sk_ref, sv_ref, so_ref, mask_ref, o_ref,
    *, scale: float, num_heads: int, int8: bool, xs_ref=None,
):
    """One encoder layer's ENTIRE attention block per grid step: fused QKV
    projection → per-head attention → output projection, one step per batch
    row. x is read from HBM once, all five weight matrices are constant
    blocks (loaded into VMEM once per layer), and no Q/K/V tensor ever
    exists in HBM — eliminating the ~1.4 ms/layer of XLA layout copies the
    separate-projection path pays (profiled; see packed_qkv_attention).

    Kᵀ comes out of the projection already transposed by computing
    ``ktₕ = Wkₕᵀ·xᵀ`` — a dot_general contracting lhs-sublane × rhs-lane,
    which the MXU handles at full rate (measured), unlike the lane×lane
    ``q·kᵀ`` form that forces an in-kernel transpose."""
    xx = x_ref[0]  # [T, dm] (int8 when int8=True — pre-quantized in XLA)
    m = mask_ref[0, 0]  # [T]
    dt = o_ref.dtype  # the compute dtype for the score/P·V bf16 dots
    bias = jnp.where(m > 0, 0.0, -1e9)[None, :]
    if int8:
        # W8A8 serving mode: x arrives ALREADY int8-quantized with per-row
        # scales (the wrapper quantizes in XLA, fusing the amax pass into
        # the upstream LayerNorm and halving this kernel's x read — round 2
        # quantized in-kernel, serializing 3 VPU passes before the first
        # MXU dot). One xq feeds all 3·H projections; the score and P·V
        # dots stay bf16 (their K-dims are head-sized — int8 buys little
        # there and costs extra quant passes).
        xq, xs = xx, xs_ref[0]  # [T, dm] int8, [T, 1] f32
    outs = []
    for h in range(num_heads):
        if int8:
            q = (
                jax.lax.dot_general(
                    xq, wq_ref[h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                * xs
                * sq_ref[h]
                + bq_ref[h]
            )  # [T, dh] f32
            kt = (
                jax.lax.dot_general(
                    wk_ref[h], xq, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                * sk_ref[h]
                * xs[:, 0][None, :]
                + bk_ref[h]
            )  # [dh, T] f32
        else:
            q = (
                jax.lax.dot_general(
                    xx, wq_ref[h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bq_ref[h]
            )  # [T, dh] f32
            kt = (
                jax.lax.dot_general(
                    wk_ref[h], xx, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bk_ref[h]
            )  # [dh, T] f32
        s = jax.lax.dot_general(
            q.astype(dt), kt.astype(dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias  # [T, T]
        smax = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - smax)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        if int8:
            v = (
                jax.lax.dot_general(
                    xq, wv_ref[h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                * xs
                * sv_ref[h]
                + bv_ref[h]
            )
        else:
            v = (
                jax.lax.dot_general(
                    xx, wv_ref[h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bv_ref[h]
            )  # [T, dh]
        o = jax.lax.dot_general(
            p.astype(dt), v.astype(dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # normalize AFTER the V dot: one [T, dh] division instead of a
        # [T, T] one (the dot is linear in p; saves a full VPU pass over
        # the score tile per head)
        outs.append((o / denom).astype(dt))
    attn = jnp.concatenate(outs, axis=-1)  # [T, dm] (lane-dim concat)
    if int8:
        aq, as_ = _quant_rows(attn.astype(jnp.float32))
        out = (
            jax.lax.dot_general(
                aq, wo_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            * as_
            * so_ref[...]
            + bo_ref[...]
        )
    else:
        out = (
            jax.lax.dot_general(
                attn, wo_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bo_ref[...]
        )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "int8"))
def attention_block(
    x,
    w_qkv,
    b_qkv,
    w_out,
    b_out,
    key_mask,
    num_heads: int,
    interpret: bool = False,
    int8: bool = False,
):
    """Fused attention block: ``attn_out(MHA(x·Wqkv))`` in ONE Pallas kernel.

    x: [B, T, dm]; w_qkv: [dm, 3·dm] (the fused projection's nn.Dense
    kernel); b_qkv: [3·dm]; w_out/b_out: the output projection. Returns
    [B, T, dm] (pre-residual, pre-LayerNorm). Inference hot path only — NOT
    differentiable (gate on ``deterministic``, like the fused FFN).

    ``int8=True`` runs the four projections W8A8 (per-output-channel weight
    scales computed here from the f32 master params; x's per-row activation
    scales computed here in XLA so the amax pass fuses upstream and the
    kernel reads int8 x; the attention-output row scales stay in-kernel
    where that tensor lives); attention's own dots stay bf16."""
    b, t, dm = x.shape
    h = num_heads
    dh = dm // h
    scale = 1.0 / np.sqrt(dh)
    t_pad = _round_up(t, _LANE)
    if t_pad != t:
        x = jnp.pad(x, [(0, 0), (0, t_pad - t), (0, 0)])
        key_mask = jnp.pad(key_mask, [(0, 0), (0, t_pad - t)])
    # [dm, 3, H, dh] → per-projection [H, dm, dh] weight tensors (tiny
    # constant re-layouts, hoisted by XLA out of the hot loop via CSE on
    # params; biases likewise)
    w4 = w_qkv.reshape(dm, 3, h, dh)
    wq, wk, wv = (w4[:, i].transpose(1, 0, 2) for i in range(3))  # [H, dm, dh]
    b3 = b_qkv.reshape(3, h, dh)
    bq = b3[0][:, None, :]  # [H, 1, dh] (broadcast over T rows)
    bk = b3[1][:, :, None]  # [H, dh, 1] (broadcast over kt columns)
    bv = b3[2][:, None, :]
    key_mask3 = key_mask[:, None, :]

    head_spec = pl.BlockSpec((h, dm, dh), lambda bi: (0, 0, 0))
    in_specs = [
        pl.BlockSpec((1, t_pad, dm), lambda bi: (bi, 0, 0)),
        head_spec,
        head_spec,
        head_spec,
        pl.BlockSpec((h, 1, dh), lambda bi: (0, 0, 0)),
        pl.BlockSpec((h, dh, 1), lambda bi: (0, 0, 0)),
        pl.BlockSpec((h, 1, dh), lambda bi: (0, 0, 0)),
        pl.BlockSpec((dm, dm), lambda bi: (0, 0)),
        pl.BlockSpec((1, dm), lambda bi: (0, 0)),
    ]
    mask_spec = pl.BlockSpec((1, 1, t_pad), lambda bi: (bi, 0, 0))
    biases = (
        bq.astype(jnp.float32),
        bk.astype(jnp.float32),
        bv.astype(jnp.float32),
    )

    if int8:
        from msa_tpu.ops.quant import (
            quantize_rows,
            quantize_weight_axis,
            quantize_weight_cols,
        )

        # [H, dm, dh]: per-output-channel over the dm (contraction) axis
        wq_i, sq = quantize_weight_axis(wq, axis=1)  # scales [H, 1, dh]
        wk_i, sk = quantize_weight_axis(wk, axis=1)
        wv_i, sv = quantize_weight_axis(wv, axis=1)
        wo_i, so = quantize_weight_cols(w_out)
        # x quantizes per row HERE in XLA (the amax pass fuses with the
        # upstream LayerNorm; the kernel reads int8 x — half the HBM
        # traffic) instead of inside the kernel, where it serialized 3 VPU
        # passes ahead of the first MXU dot (VERDICT r3 #8)
        xq, xs = quantize_rows(x.astype(jnp.float32))
        from jax.experimental.pallas import tpu as pltpu

        out = pl.pallas_call(
            functools.partial(_attn_block_int8_kernel, scale=scale, num_heads=h),
            out_shape=jax.ShapeDtypeStruct((b, t_pad, dm), x.dtype),
            grid=(b,),
            # the unrolled 12-head loop's live f32 intermediates (q/kt/p per
            # head + the dequantized projections) exceed the compiler's
            # default 16 MiB scoped-vmem budget at T=512/dm=768 (measured:
            # 18.96 MiB requested → compile error on the round-5 backend).
            # The hardware has far more VMEM; raise this kernel's cap.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            in_specs=[in_specs[0], pl.BlockSpec((1, t_pad, 1), lambda bi: (bi, 0, 0))]
            + in_specs[1:]
            + [
                pl.BlockSpec((h, 1, dh), lambda bi: (0, 0, 0)),
                pl.BlockSpec((h, dh, 1), lambda bi: (0, 0, 0)),
                pl.BlockSpec((h, 1, dh), lambda bi: (0, 0, 0)),
                pl.BlockSpec((1, dm), lambda bi: (0, 0)),
                mask_spec,
            ],
            out_specs=pl.BlockSpec((1, t_pad, dm), lambda bi: (bi, 0, 0)),
            interpret=interpret,
        )(
            xq,
            xs,
            wq_i,
            wk_i,
            wv_i,
            *biases,
            wo_i,
            b_out[None, :].astype(jnp.float32),
            sq,
            sk.transpose(0, 2, 1),  # [H, dh, 1] — kt's row scales
            sv,
            so[None, :].astype(jnp.float32),
            key_mask3,
        )
        return out[:, :t]

    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, scale=scale, num_heads=h),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, dm), x.dtype),
        grid=(b,),
        in_specs=in_specs + [mask_spec],
        out_specs=pl.BlockSpec((1, t_pad, dm), lambda bi: (bi, 0, 0)),
        interpret=interpret,
    )(
        x,
        wq.astype(x.dtype),
        wk.astype(x.dtype),
        wv.astype(x.dtype),
        *biases,
        w_out.astype(x.dtype),
        b_out[None, :].astype(jnp.float32),
        key_mask3,
    )
    return out[:, :t]


# --- differentiable wrapper ---------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def attention_with_vjp(q, k, v, key_mask, interpret=False):
    """Pallas forward + Pallas flash-style backward, so the fused kernel is
    usable in training end to end. The forward is the all-heads-per-step
    kernel (:func:`_mha_attention_lse`); T beyond the single-pass VMEM budget
    switches to the blockwise online-softmax kernel; all share the same
    backward (it is blockwise by construction)."""
    if q.shape[2] > _SINGLE_PASS_MAX_T:
        return flash_attention(q, k, v, key_mask, interpret=interpret)
    return _mha_attention_lse(q, k, v, key_mask, interpret=interpret)[0]


def _attn_fwd(q, k, v, key_mask, interpret=False):
    if q.shape[2] > _SINGLE_PASS_MAX_T:
        out, lse = _flash_attention_lse(q, k, v, key_mask, interpret=interpret)
    else:
        out, lse = _mha_attention_lse(q, k, v, key_mask, interpret=interpret)
    return out, (q, k, v, key_mask, lse, out)


def _attn_bwd(interpret, res, g):
    q, k, v, key_mask, lse, o = res
    dq, dk, dv = attention_bwd(q, k, v, key_mask, lse, o, g, interpret=interpret)
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
    q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale: float,
):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # [BQ, D] — native-dtype MXU dot, f32 accumulation
    k = k_ref[0, 0]  # [BK, D]
    v = v_ref[0, 0]  # [BK, D]
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
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_cur, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_cur, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l_final = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / l_final).astype(o_ref.dtype)
        lse_ref[0, 0, 0] = (m_scr[:, 0] + jnp.log(l_final[:, 0])).astype(
            lse_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_attention_lse(
    q, k, v, key_mask,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
):
    """Blockwise attention with online softmax → (o, lse). Same contract as
    :func:`_fused_attention_lse`; VMEM footprint O(BQ·BK) instead of O(BQ·T)."""
    b, h, t, d = q.shape
    scale = 1.0 / np.sqrt(d)
    t_pad = _round_up(t, max(_LANE, block_k))
    d_pad = _round_up(d, _LANE)
    bq = min(block_q, t_pad)
    bk = min(block_k, t_pad)

    q, k, v, key_mask = _pad_qkvm(q, k, v, key_mask, t_pad, d_pad)
    key_mask3 = key_mask[:, None, :]

    grid = (b, h, t_pad // bq, t_pad // bk)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, t_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANE), jnp.float32) if _HAS_PLTPU else None,
            pltpu.VMEM((bq, _LANE), jnp.float32) if _HAS_PLTPU else None,
            pltpu.VMEM((bq, d_pad), jnp.float32) if _HAS_PLTPU else None,
        ],
        interpret=interpret,
    )(q, k, v, key_mask3)
    return out[:, :, :t, :d], lse[:, :, 0, :t]


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
    return _flash_attention_lse(q, k, v, key_mask, block_q, block_k, interpret)[0]
