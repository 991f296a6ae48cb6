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
