"""Benchmark — prints ONE JSON line for the driver.

Metric (BASELINE.json): video-seconds analyzed per second per chip, offline.
Each analyzed segment covers `segment_duration` = 5 s of video (reference
config.py:43). ``vs_baseline`` is the ratio against the driver-assigned
target of 50× realtime per chip (BASELINE.json:5) — 1.0 means the target is
met exactly.

Currently benches the fusion stage (baseline config #1); upgraded to the full
multimodal segment pipeline as it lands.
"""

from __future__ import annotations

import json
import time

import numpy as np

SEGMENT_SECONDS = 5.0
TARGET_X_REALTIME = 50.0


def bench_fusion(batch: int = 1024, iters: int = 50) -> float:
    import jax
    import jax.numpy as jnp

    from msa_tpu.models import fusion as fusion_lib

    model = fusion_lib.FusionMLP()
    params = fusion_lib.init_params(model, seed=0)
    rng = np.random.default_rng(0)
    face = jnp.asarray(rng.normal(size=(batch, model.face_dim)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(batch, model.audio_dim)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(batch, model.text_dim)), jnp.float32)

    @jax.jit
    def forward(face, audio, text):
        return model.apply({"params": params}, face, audio, text)["fused"]

    forward(face, audio, text).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(face, audio, text)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    segments_per_sec = batch * iters / dt
    return segments_per_sec * SEGMENT_SECONDS


def main():
    video_seconds_per_sec = bench_fusion()
    x_realtime = video_seconds_per_sec  # per chip (single-chip bench)
    print(
        json.dumps(
            {
                "metric": "video_seconds_per_sec_per_chip_fusion_stage",
                "value": round(video_seconds_per_sec, 2),
                "unit": "video-seconds/sec/chip",
                "vs_baseline": round(x_realtime / TARGET_X_REALTIME, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
