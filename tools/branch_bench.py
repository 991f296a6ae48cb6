"""Branch-level breakdown of the production device graph on the real chip.

Times the face / audio / text branches and the full fused graph separately
(each jitted standalone, fetch-synchronized, steady-state) at the production
shapes (B=64, 80 k samples, 512 tokens, int8 serving). The deltas between
sum-of-branches and the full graph show XLA's cross-branch scheduling win.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/branch_bench.py
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
    import jax.numpy as jnp

    from msa_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from msa_tpu.pipeline.graph import (
        PipelineModels,
        SegmentInputs,
        SegmentPipeline,
    )

    b = int(os.environ.get("B", "64"))
    tokens = int(os.environ.get("TOKENS", "512"))
    t0 = time.perf_counter()
    models = PipelineModels.initialize(seed=0, quantize=os.environ.get("MSA_QUANTIZE", "int8"))
    pipe = SegmentPipeline(models)
    params = models.params_tree()
    print(f"init {time.perf_counter() - t0:.1f}s  B={b} tokens={tokens}", flush=True)

    rng = np.random.default_rng(0)
    inp = SegmentInputs.zeros(models, b, tokens=tokens)
    inp.frames = rng.integers(0, 255, inp.frames.shape, dtype=np.uint8)
    inp.audio = (0.1 * rng.standard_normal(inp.audio.shape)).astype(np.float32)
    inp.token_ids = rng.integers(0, 1000, inp.token_ids.shape).astype(np.int32)
    inp.token_mask = np.ones_like(inp.token_mask)

    frames = jax.device_put(inp.frames)
    audio = jax.device_put(inp.audio)
    ids = jax.device_put(inp.token_ids)
    mask = jax.device_put(inp.token_mask)
    avail = jax.device_put(np.ones(b, bool))
    comp = jax.device_put(np.full(b, 0.5, np.float32))
    prev_lm = jax.device_put(inp.prev_landmarks)
    has_prev = jax.device_put(np.asarray(False))

    # standalone-branch compiles can pick a fusion layout whose kernel stack
    # exceeds the default 16 MiB scoped-vmem budget (the full graph does not);
    # raise it for these probe executables only
    opts = {"xla_tpu_scoped_vmem_limit_kib": 49152}
    face = jax.jit(
        lambda p, f, a, pl, hp: pipe._face_branch(p, f, a, pl, hp),
        compiler_options=opts,
    )
    aud = jax.jit(lambda p, x, a: pipe._audio_branch(p, x, a), compiler_options=opts)
    txt = jax.jit(
        lambda p, i, m, a, c, r: pipe._text_branch(p, i, m, a, c, r),
        compiler_options=opts,
    )

    t_face = fetch_time(face, params, frames.astype(jnp.uint8), avail, prev_lm, has_prev)
    print(f"face   {t_face:7.2f} ms", flush=True)
    t_aud = fetch_time(aud, params, audio, avail)
    print(f"audio  {t_aud:7.2f} ms", flush=True)
    t_txt = fetch_time(txt, params, ids, mask, avail, comp, comp)
    print(f"text   {t_txt:7.2f} ms", flush=True)

    t_full = fetch_time(lambda i: pipe.run(i)[0], inp)
    print(
        f"full   {t_full:7.2f} ms   (sum of branches {t_face + t_aud + t_txt:.2f};"
        f" overlap win {t_face + t_aud + t_txt - t_full:+.2f})",
        flush=True,
    )
    vidss = b * 5.0 / (t_full / 1000)
    print(f"throughput {vidss:.0f} vid-s/s", flush=True)


if __name__ == "__main__":
    main()
