"""Strided-conv feature extractor — Pallas TPU kernel.

The wav2vec2 conv extractor (reference capability:
``/root/reference/src/analyzers/audio_analyzer.py:33-39`` loads a pretrained
wav2vec2 whose feature extractor runs 7 stride-5/2 convs) is the largest
single op left in the device graph: ~1.57 TFLOP per 64-segment batch, and
XLA's TPU conv runs the stride-2 512-channel layers at only ~56 TFLOPS
effective (27.9 ms, BASELINE.md).

The fix the MXU wants is the *pair trick*: a VALID stride-2 kernel-k conv

    out[i] = x[2i]·W0 + x[2i+1]·W1 (+ x[2i+2]·W2 for k=3)

becomes ONE full-width matmul if the input reshapes to non-overlapping pairs
``[L, C] → [L/2, 2C]`` — taps 0 and 1 stack into a [2C, C'] weight; kernel-3's
third tap is the NEXT pair's first half (one more matmul + a one-row halo).
Done in XLA this loses: the reshape is a real HBM relayout on TPU tiled
layouts (measured 43.6 ms vs conv's 27.9, BASELINE.md negative result #1).
Done HERE, inside the kernel, the reshape touches only the VMEM-resident
input tile — a sublane regroup at VMEM bandwidth — and the matmuls run at
the plain-matmul MXU rate. GELU (wav2vec2 puts one after every conv) fuses
into the epilogue so the activation never makes an extra HBM round trip.

Weight layout is exactly ``nn.Conv``'s (kernel [k, C_in, C_out], no bias) so
the same params/checkpoints/HF imports serve both implementations.

STATUS: equivalence-tested but NOT the production path — a negative result,
measured on the real chip (tools/conv_probe.py, largest layer B=64 L=15999):
XLA conv 13.6 ms (59 TFLOPS) vs this kernel 19.1 ms (42 TFLOPS). The in-VMEM
pair reshape is NOT a cheap sublane regroup under Mosaic: with tap2+GELU
disabled the kernel still runs at 31 TFLOPS on its own FLOPs, i.e. the
[2·bl, C]→[bl, 2C] relayout moves ~1 GB/layer at only ~77 GB/s effective,
eating more than the MXU saves; block sizes 256/512/1024 are within 5%.
Relayout-free reformulations all conserve the cost: selection-matrix matmuls
(P_even @ (X@W_t)) cost 2–2.5× the conv FLOPs, polyphase even/odd streams
just move the same regroup to the output side, and Mosaic has no strided
sublane load (BASELINE.md negative results #1/#2/#4). Kept in-tree as the
measured record + a correctness-tested base if Mosaic grows the primitive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msa_tpu.ops.pallas.ffn import _gelu_exact


def _conv_kernel(x_ref, halo_ref, w01_ref, w2_ref, o_ref, *, tap2: bool, gelu: bool):
    bl2, c = x_ref.shape[1], x_ref.shape[2]
    bl = bl2 // 2
    pairs = x_ref[...].reshape(bl, 2 * c)  # VMEM sublane regroup — cheap
    acc = jax.lax.dot_general(
        pairs, w01_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if tap2:
        # x[2i+2] = pair i+1's first half; the block's LAST row wraps, so it
        # is patched from the one-row halo (the next block's first element).
        # The rotate runs in f32: Mosaic's vector rotate needs 32-bit lanes
        # ("Rotate with non-32-bit data" otherwise) — two cheap VPU casts
        # over a [bl, C] tile
        ev = pairs[:, :c].astype(jnp.float32)
        nxt = pltpu.roll(ev, shift=bl - 1, axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, (bl, 1), 0)
        nxt = jnp.where(
            row == bl - 1, halo_ref[0, 0:1, :].astype(jnp.float32), nxt
        )
        acc = acc + jax.lax.dot_general(
            nxt.astype(pairs.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if gelu:
        acc = _gelu_exact(acc)
    o_ref[...] = acc.reshape(o_ref.shape).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("apply_gelu", "block_l", "interpret")
)
def conv_stride2_fused(
    x: jnp.ndarray,  # [B, L, C]
    w: jnp.ndarray,  # [k, C, C'] — nn.Conv kernel layout, k in (2, 3)
    apply_gelu: bool = True,
    block_l: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """VALID stride-2 conv1d (+ optional exact GELU) as in-VMEM pair matmuls.

    Returns [B, (L-k)//2 + 1, C']. Requires C and C' to be lane multiples
    (128); callers fall back to XLA conv otherwise."""
    b, length, c = x.shape
    k, cin, cout = w.shape
    assert k in (2, 3) and cin == c, (k, cin, c)
    assert c % 128 == 0 and cout % 128 == 0, (c, cout)
    out_len = (length - k) // 2 + 1
    bl = max(8, min(block_l, ((out_len + 7) // 8) * 8))
    n_blocks = (out_len + bl - 1) // bl
    # main blocks need 2·bl·n_blocks input rows; the halo block reads 8 rows
    # past the last main block (only row 0 is used; the rest is padding)
    need = 2 * bl * n_blocks + 8
    if need > length:
        x = jnp.pad(x, [(0, 0), (0, need - length), (0, 0)])
    dtype = x.dtype
    w01 = w[:2].reshape(2 * cin, cout).astype(dtype)
    w2 = (w[2] if k == 3 else jnp.zeros((cin, cout), w.dtype)).astype(dtype)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, tap2=(k == 3), gelu=apply_gelu),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * bl, cout), dtype),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 2 * bl, c), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec(
                (1, 8, c), lambda bi, j: (bi, (j + 1) * (2 * bl) // 8, 0)
            ),
            pl.BlockSpec((2 * c, cout), lambda bi, j: (0, 0)),  # constant
            pl.BlockSpec((c, cout), lambda bi, j: (0, 0)),  # constant
        ],
        out_specs=pl.BlockSpec((1, bl, cout), lambda bi, j: (bi, j, 0)),
        interpret=interpret,
    )(x, x, w01, w2)
    return out[:, :out_len]


def conv_stride2_reference(
    x: jnp.ndarray, w: jnp.ndarray, apply_gelu: bool = True
) -> jnp.ndarray:
    """Plain-XLA reference: lax conv (VALID, stride 2) + exact GELU."""
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(2,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    if apply_gelu:
        out = jax.nn.gelu(out, approximate=False)
    return out.astype(x.dtype)
