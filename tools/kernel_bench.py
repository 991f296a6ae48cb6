"""Per-kernel microbenchmarks — the reproducible evidence behind BASELINE.md.

Run on a real TPU (`python tools/kernel_bench.py`); prints one line per
stage with achieved time and effective TFLOPS/TOPS against the measured
device ceiling. All timing is host-fetch-synchronized (under the axon
tunnel, ``block_until_ready`` returns early; a fetch is the only barrier)
and steady-state (compile + warmup excluded).

Methodology notes that shaped the production kernels (see BASELINE.md for
the numbers these reproduce):
- standalone pallas_call timings carry ~1-2 ms of dispatch overhead; the
  N-layer chain amortizes it and matches in-program profiles.
- the matmul chain is the practical ceiling (~170 TFLOPS bf16 of the 197
  peak); the int8 chain measures ~312 effective TOPS.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

# runnable as `python tools/kernel_bench.py` without installing the package
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(fn, *args, iters: int = 15) -> float:
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from msa_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    N, D, F = 32768, 768, 3072  # BERT-base FFN shapes at B=64, T=512

    x = jax.device_put(rng.normal(size=(N, D)).astype(np.float32).astype(jnp.bfloat16))
    w1 = jax.device_put((rng.normal(size=(D, F)) / 27).astype(np.float32))
    w2 = jax.device_put((rng.normal(size=(F, D)) / 55).astype(np.float32))
    b1 = jax.device_put(np.zeros(F, np.float32))
    b2 = jax.device_put(np.zeros(D, np.float32))

    # ceiling: pure bf16 matmul chain
    @jax.jit
    def chain(x, w1, w2):
        a, b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
        y = x
        for _ in range(12):
            y = (y @ a) @ b
        return y.sum()

    ms = _timeit(chain, x, w1, w2)
    flops = 12 * 2 * (N * D * F * 2)
    print(f"matmul chain (bf16 ceiling): {ms:7.2f} ms  {flops/ms/1e9:6.1f} TFLOPS")

    from msa_tpu.ops.pallas.ffn import ffn_fused, ffn_fused_int8

    @jax.jit
    def ffn16(x, w1, b1, w2, b2):
        y = x
        for _ in range(12):
            y = ffn_fused(
                y,
                w1.astype(jnp.bfloat16),
                b1.astype(jnp.bfloat16),
                w2.astype(jnp.bfloat16),
                b2.astype(jnp.bfloat16),
            )
        return y.sum()

    @jax.jit
    def ffn8(x, w1, b1, w2, b2):
        y = x
        for _ in range(12):
            y = ffn_fused_int8(y, w1, b1, w2, b2)
        return y.sum()

    ms = _timeit(ffn16, x, w1, b1, w2, b2)
    print(f"12x fused FFN bf16:          {ms:7.2f} ms  {flops/ms/1e9:6.1f} TFLOPS")
    ms = _timeit(ffn8, x, w1, b1, w2, b2)
    print(f"12x fused FFN int8 (W8A8):   {ms:7.2f} ms  {flops/ms/1e9:6.1f} TOPS-equiv")

    # full encoder trunk (the composite the pipeline actually runs)
    import dataclasses

    from msa_tpu.models.transformer import EncoderConfig, TransformerEncoder

    xt = rng.normal(size=(64, 512, 768)).astype(np.float32)
    base = EncoderConfig(
        num_layers=12,
        compute_dtype="bfloat16",
        attention_impl="pallas",
        ffn_impl="pallas",
    )
    params = None
    for q in ("none", "int8"):
        te = TransformerEncoder(dataclasses.replace(base, quantize=q))
        if params is None:
            params = jax.device_put(
                te.init(jax.random.PRNGKey(0), xt[:1], None)["params"]
            )
        xd = jax.device_put(xt)
        fn = jax.jit(lambda p, x, te=te: te.apply({"params": p}, x, None).sum())
        ms = _timeit(fn, params, xd)
        print(f"12-layer trunk quantize={q:4s}: {ms:7.2f} ms  (B=64, T=512)")

    # audio conv extractor (XLA conv; Pallas/matmul/int8 alternatives all
    # measured slower — BASELINE.md "negative results")
    from msa_tpu.models.audio import (
        AudioEmotionModel,
        AudioModelConfig,
        ConvFeatureExtractor,
        init_params,
    )

    cfg = AudioModelConfig(encoder=base)
    fx = ConvFeatureExtractor(cfg)
    ap = jax.device_put(
        init_params(AudioEmotionModel(cfg), 0, samples=8000)["feature_extractor"]
    )
    wav = jax.device_put(
        (0.1 * rng.normal(size=(64, 80000))).astype(np.float32)
    )
    fn = jax.jit(lambda p, w: fx.apply({"params": p}, w).sum())
    ms = _timeit(fn, ap, wav)
    print(f"wav2vec2 conv extractor:     {ms:7.2f} ms  (B=64, 80k samples)")


if __name__ == "__main__":
    main()
