"""Weight quantization helpers for the int8 serving mode.

v5e's MXU runs int8×int8→int32 at ~312 effective TOPS on our shapes vs ~170
TFLOPS bf16 (measured, BASELINE.md) — the standard W8A8 recipe (per-output-
channel weight scales, per-row dynamic activation scales) roughly doubles
matmul throughput at inference. Weights are quantized ON THE FLY in XLA from
the ordinary f32 params (one cheap elementwise pass per call, ~0.1 ms for a
whole BERT layer): param trees, HF import, tensor-parallel specs and
checkpoints stay exactly as they are. Activations are quantized per row
inside the kernels (`msa_tpu.ops.pallas`), where the row amax is already
VMEM-resident.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def quantize_weight_cols(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of a [in, out] kernel.

    Returns (w_i8 [in, out], scale [out] f32) with w ≈ w_i8 * scale."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return w_i8, scale


def quantize_weight_axis(
    w: jnp.ndarray, axis: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization reducing over ``axis`` (the contraction
    dim), keeping per-channel scales on the remaining axes (kept with a
    singleton ``axis`` for direct broadcast)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return w_i8, scale


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 activation quantization: (x_i8, scale [.., 1]).

    Shared by the Pallas kernels (pure jnp — traces inside a kernel)."""
    amax = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True), 1e-8
    )
    scale = amax / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return x_i8, scale
