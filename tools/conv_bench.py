"""Per-layer benchmark: XLA conv vs the Pallas pair-matmul kernel on the
wav2vec2 extractor shapes (B=64, 5 s @ 16 kHz). Run on the real chip.

Usage: python tools/conv_bench.py [--iters 20]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.ops.pallas.conv import conv_stride2_fused, conv_stride2_reference


def fetch_time(fn, *args, iters=20, warmup=3):
    # fn returns a SCALAR (device-side reduce): the fetch that closes the
    # pipeline moves 4 bytes, not the [B, L, 512] activation
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)  # the axon tunnel only syncs on fetch
    t1 = time.perf_counter()
    return 1000 * (t1 - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    interpret = jax.devices()[0].platform != "tpu"
    b = args.batch

    # wav2vec2-base stride-2 layers after the k=10/s=5 stem (input 80k):
    # (L_in, k) pairs; all 512→512 channels
    layers = [(15999, 3), (7999, 3), (3999, 3), (1999, 3), (999, 2), (499, 2)]
    tot_x, tot_p = 0.0, 0.0
    for L, k in layers:
        x = jax.device_put(
            rng.standard_normal((b, L, 512), dtype=np.float32).astype(jnp.bfloat16)
        )
        w = jax.device_put(
            (0.04 * rng.standard_normal((k, 512, 512), dtype=np.float32))
        )
        ref = jax.jit(lambda x, w: conv_stride2_reference(x, w))
        ref_sum = jax.jit(lambda x, w: conv_stride2_reference(x, w).astype(jnp.float32).sum())
        pal = jax.jit(lambda x, w: conv_stride2_fused(x, w, interpret=interpret))
        pal_sum = jax.jit(
            lambda x, w: conv_stride2_fused(x, w, interpret=interpret).astype(jnp.float32).sum()
        )
        t_x = fetch_time(ref_sum, x, w, iters=args.iters)
        t_p = fetch_time(pal_sum, x, w, iters=args.iters)
        # numerics (fetch the small tail block only)
        got = np.asarray(pal(x, w)[:2, :64], np.float32)
        want = np.asarray(ref(x, w)[:2, :64], np.float32)
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        flop = b * ((L - k) // 2 + 1) * k * 512 * 512 * 2
        print(
            f"L={L:6d} k={k}  xla {t_x:7.2f} ms ({flop/t_x/1e9:6.1f} TFLOPS)"
            f"  pallas {t_p:7.2f} ms ({flop/t_p/1e9:6.1f} TFLOPS)"
            f"  speedup {t_x/t_p:4.2f}x  relerr {rel:.2e}",
            flush=True,
        )
        tot_x += t_x
        tot_p += t_p
    print(f"TOTAL stride-2 layers: xla {tot_x:.2f} ms  pallas {tot_p:.2f} ms  "
          f"speedup {tot_x/tot_p:.2f}x", flush=True)


if __name__ == "__main__":
    main()
