"""Benchmark — prints ONE JSON line for the driver.

Metric (BASELINE.json): video-seconds analyzed per second per chip, offline.
Each analyzed segment covers ``segment_duration`` = 5 s of video (reference
config.py:43), so throughput = segments/sec × 5. The measured graph is the
FULL flagship pipeline — face landmark net + geometry + crop + emotion CNN,
audio DSP + wav2vec2-style encoder, BERT trunk + heads, fusion MLP — i.e.
everything the reference pays per segment (SURVEY §6), as one jitted XLA
program over production shapes (192×192 frames, 80 000 audio samples, 512
tokens).

``vs_baseline`` is the ratio against the driver-assigned target of 50×
realtime per chip (BASELINE.json:5) — 1.0 means the target is met exactly.
"""

from __future__ import annotations

import json
import time

import numpy as np

SEGMENT_SECONDS = 5.0
TARGET_X_REALTIME = 50.0


def bench_full_pipeline(batch: int = 64, iters: int = 10, warmup: int = 2):
    from msa_tpu.pipeline.graph import PipelineModels, SegmentInputs, SegmentPipeline

    models = PipelineModels.initialize(seed=0)
    pipeline = SegmentPipeline(models)

    rng = np.random.default_rng(0)
    inp = SegmentInputs.zeros(models, batch)
    inp.frames = rng.integers(0, 255, size=inp.frames.shape, dtype=np.uint8)
    inp.audio = (0.1 * rng.normal(size=inp.audio.shape)).astype(np.float32)
    inp.token_ids = rng.integers(
        0, models.text.cfg.vocab_size, size=inp.token_ids.shape
    ).astype(np.int32)
    inp.token_mask = np.ones_like(inp.token_mask)
    inp.completeness = rng.random(batch).astype(np.float32)
    inp.relevance = rng.random(batch).astype(np.float32)

    import jax

    inp = jax.device_put(inp)
    for _ in range(warmup):
        out, _ = pipeline.run(inp)
        # NOTE: under the axon tunnel block_until_ready returns before the
        # computation finishes; a host fetch is the only true sync, so all
        # timing below is fetch-based.
        np.asarray(out["fused"])

    t0 = time.perf_counter()
    for _ in range(iters):
        out, _ = pipeline.run(inp)
    np.asarray(out["fused"])  # forces completion of the whole in-order queue
    dt = time.perf_counter() - t0

    segments_per_sec = batch * iters / dt
    return segments_per_sec * SEGMENT_SECONDS, segments_per_sec


def main():
    video_seconds_per_sec, segs = bench_full_pipeline()
    print(
        json.dumps(
            {
                "metric": "offline_video_seconds_per_sec_per_chip",
                "value": round(video_seconds_per_sec, 2),
                "unit": "video-seconds/sec/chip",
                "vs_baseline": round(video_seconds_per_sec / TARGET_X_REALTIME, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
