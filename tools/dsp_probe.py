"""Isolate the audio branch's cost: encoder vs the DSP feature stack.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/dsp_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def fetch_time(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return 1000 * (time.perf_counter() - t0) / iters


def main():
    import jax

    from msa_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp  # noqa: F401

    from msa_tpu.ops import audio_features as AF
    from msa_tpu.pipeline.graph import PipelineModels

    rng = np.random.default_rng(0)
    b = 64
    x = jax.device_put((0.1 * rng.standard_normal((b, 80000))).astype(np.float32))

    dsp = jax.jit(jax.vmap(lambda w: AF.audio_feature_stack(w, 16000, "reference")))
    t = fetch_time(dsp, x)
    print(f"dsp stack (reference pitch) {t:7.2f} ms", flush=True)

    dsp_acf = jax.jit(jax.vmap(lambda w: AF.audio_feature_stack(w, 16000, "acf")))
    t = fetch_time(dsp_acf, x)
    print(f"dsp stack (acf pitch)       {t:7.2f} ms", flush=True)

    mf = jax.jit(jax.vmap(lambda w: AF.mfcc(w, 16000)))
    t = fetch_time(mf, x)
    print(f"mfcc alone                  {t:7.2f} ms", flush=True)

    t0 = time.perf_counter()
    models = PipelineModels.initialize(seed=0, quantize="int8")
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)
    enc = jax.jit(
        lambda p, a: models.audio.apply({"params": p}, a)
    )
    t = fetch_time(enc, models.audio_params, x)
    print(f"audio encoder               {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
