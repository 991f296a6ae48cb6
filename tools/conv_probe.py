"""Isolate where the Pallas pair-matmul conv kernel spends time.

Variants on the largest wav2vec2 stride-2 layer (B=64, L=15999, k=3, 512ch):
  xla        — lax conv reference
  full       — the real kernel (reshape + tap2 roll + gelu)
  notap2     — k=3 weights but tap2 disabled (WRONG numerics; isolates roll+2nd matmul)
  nogelu     — full minus gelu epilogue
  bl256/bl1024 — block-size sweep of the full kernel

Each line prints as soon as it is measured. Run: python tools/conv_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from msa_tpu.ops.pallas import conv as C


def fetch_time(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    t1 = time.perf_counter()
    return 1000 * (t1 - t0) / iters


def main():
    rng = np.random.default_rng(0)
    b, L, k = 64, 15999, 3
    x = jax.device_put(
        rng.standard_normal((b, L, 512), dtype=np.float32).astype(jnp.bfloat16)
    )
    w = jax.device_put(0.04 * rng.standard_normal((k, 512, 512), dtype=np.float32))
    flop = b * ((L - k) // 2 + 1) * k * 512 * 512 * 2

    def report(name, fn):
        t = fetch_time(fn, x, w)
        print(f"{name:10s} {t:7.2f} ms  ({flop / t / 1e9:6.1f} TFLOPS)", flush=True)

    report("xla", jax.jit(lambda x, w: C.conv_stride2_reference(x, w).astype(jnp.float32).sum()))
    report("full", jax.jit(lambda x, w: C.conv_stride2_fused(x, w).astype(jnp.float32).sum()))

    # tap2 disabled: patch the private kernel via a k=2 call on the same shapes
    w2 = w[:2]
    report("notap2", jax.jit(lambda x, w: C.conv_stride2_fused(x, w2).astype(jnp.float32).sum()))
    report("nogelu", jax.jit(lambda x, w: C.conv_stride2_fused(x, w, apply_gelu=False).astype(jnp.float32).sum()))
    for bl in (256, 1024):
        report(
            f"bl{bl}",
            jax.jit(functools.partial(
                lambda x, w, bl: C.conv_stride2_fused(x, w, block_l=bl).astype(jnp.float32).sum(), bl=bl
            )),
        )


if __name__ == "__main__":
    main()
