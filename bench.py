"""Benchmark — prints complete JSON result lines for the driver.

Metric (BASELINE.json): video-seconds analyzed per second per chip, offline.
Each analyzed segment covers ``segment_duration`` = 5 s of video (reference
config.py:43), so throughput = segments/sec × 5. The measured graph is the
FULL flagship pipeline — face landmark net + geometry + crop + emotion CNN,
audio DSP + wav2vec2-style encoder, BERT trunk + heads, fusion MLP — i.e.
everything the reference pays per segment (SURVEY §6), as one jitted XLA
program over production shapes (192×192 frames, 80 000 audio samples).

``value`` stays the honest 512-token worst case (every transcript maxed out).
The production path buckets transcripts to the shortest sufficient token
length (processors/offline.py), so the record also reports the bucket
spectrum (tokens → vid-s/s), the p50/p90 single-segment device latency (the
streaming path: batch 1, no-text 32-token bucket, N=100 fetch-synchronized),
and an end-to-end ``process_video`` ×-realtime figure on a synthetic video
(host decode + diarization + device, the honest system-level number).

``vs_baseline`` is the ratio against the driver-assigned target of 50×
realtime per chip (BASELINE.json:5) — 1.0 means the target is met exactly.

Driver-budget protocol (round-2 postmortem: BENCH_r02.json was rc=124 — the
single JSON line was only printed after ~4 cold compiles, so one slow compile
erased the whole round's record):
- The HEADLINE (512-token bucket) is measured FIRST and a complete JSON line
  is printed and flushed the moment it exists. Every subsequent measurement
  re-prints a complete, enriched line — whichever line the driver keeps
  (first or last) is valid on its own.
- The p50 device latency is measured UNCONDITIONALLY right after the
  headline (its B=1 graph is the smallest compile in the set); then the
  honest streaming number (`p50_process_segment_ms`, full host+device
  StreamingProcessor.process_segment wall time — reuses the graph p50 just
  warmed, so it is the cheapest remaining stage); then the e2e
  ``process_video`` figure (auto-sized batch + the shipped ASR's whisper
  compiles, behind a permissive fixed gate — an overrun only costs later
  stages, never the record); only then the bucket-spectrum color.
- A wall-clock budget (``MSA_BENCH_BUDGET_S``, default 660 s) gates each
  optional stage; stages that don't fit are skipped and listed in
  ``"skipped"``.
- A repo-shipped compile-cache seed (``jit_cache_seed/``, built by
  tools/make_cache_seed.py) is extracted on fingerprint match before the
  mode choice — a matching driver host benches WARM in int8.
- Cache warmth is a VALIDITY check, not an existence check (round-3
  postmortem: the driver host rejected every cached entry on machine-feature
  mismatch while bench saw a non-empty dir and picked the larger int8 kernel
  set cold). A marker file records (host fingerprint, compiled quantize
  modes) after each successful headline; warmth requires a matching marker.
- On a cold cache the encoders fall back to ``quantize="none"`` (halves the
  Pallas kernel variants to compile → roughly halves cold-compile wall time;
  bf16-only measured 2588 vs 2879 vid-s/s in round 2) and the record carries
  ``"degraded": true`` + the active ``"quantize"`` mode. With a generous
  budget a final stage upgrades the headline to int8 and warms the cache.
- SIGTERM (what ``timeout`` sends first) triggers an immediate final print
  of whatever has been measured.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

# silence XLA:CPU AOT cross-host feature-mismatch ERROR spam (pages of
# cpu_aot_loader lines polluted BENCH_r03/r04 artifacts): those entries are
# tiny host-init graphs that recompile in seconds; the TPU executables
# don't go through that loader. Must be set before jax/XLA loads.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np

T0 = time.perf_counter()
# 660 s: round-3's driver record proves a ~700 s wall run completes with
# rc=0 (BENCH_r03: elapsed 674.9 s, recorded), and emit-early + the SIGTERM
# handler make even a timeout kill leave a complete last line in the tail —
# so the budget errs toward measuring MORE stages, not toward exiting early.
BUDGET_S = float(os.environ.get("MSA_BENCH_BUDGET_S", "660"))
SEGMENT_SECONDS = 5.0
TARGET_X_REALTIME = 50.0
TOKEN_BUCKETS = (32, 128, 512)

_record: dict = {}
_headline_printed = False


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - T0)


def _emit() -> None:
    """Print ONE complete JSON line from the current record state."""
    global _headline_printed
    if "value" not in _record:
        return  # nothing measured yet — an incomplete line helps nobody
    out = dict(_record)
    out["elapsed_s"] = round(time.perf_counter() - T0, 1)
    print(json.dumps(out), flush=True)
    _headline_printed = True


def _on_sigterm(signum, frame):  # noqa: ARG001
    _emit()
    os._exit(0 if _headline_printed else 1)


def _marker_path() -> str:
    from msa_tpu.utils.jit_cache import cache_dir

    return os.path.join(cache_dir() or ".", "bench_host_marker.json")


def _cache_is_warm(quantize: str) -> bool:
    """True only when a PREVIOUS bench on THIS host recorded that it
    finished compiling this quantize mode's kernel set — validity, not mere
    dir-non-emptiness (the round-3 false positive: the driver host rejected
    every cached entry on machine-feature mismatch while bench saw a
    non-empty dir, picked the larger int8 kernel set cold, and the headline
    compile blew the budget). The cache dir itself is host-fingerprinted
    (utils.jit_cache), so a marker's presence implies host validity; the
    marker is written by :func:`_record_warm` after a headline completes."""
    try:
        with open(_marker_path()) as f:
            marker = json.load(f)
        return quantize in (marker.get("modes") or [])
    except (OSError, ValueError):
        return False


def _record_warm(quantize: str) -> None:
    """After a successful headline: this host has compiled+run `quantize`'s
    full kernel set — future bench runs may trust the cache for it."""
    modes: list = []
    try:
        with open(_marker_path()) as f:
            modes = list(json.load(f).get("modes") or [])
    except (OSError, ValueError):
        pass
    if quantize not in modes:
        modes.append(quantize)
    try:
        os.makedirs(os.path.dirname(_marker_path()), exist_ok=True)
        with open(_marker_path(), "w") as f:
            json.dump({"modes": modes}, f)
    except OSError:
        pass


def _make_inputs(models, batch: int, tokens: int):
    from msa_tpu.pipeline.graph import SegmentInputs

    rng = np.random.default_rng(0)
    inp = SegmentInputs.zeros(models, batch, tokens=tokens)
    inp.frames = rng.integers(0, 255, size=inp.frames.shape, dtype=np.uint8)
    inp.audio = (0.1 * rng.normal(size=inp.audio.shape)).astype(np.float32)
    inp.token_ids = rng.integers(
        0, models.text.cfg.vocab_size, size=inp.token_ids.shape
    ).astype(np.int32)
    inp.token_mask = np.ones_like(inp.token_mask)
    inp.completeness = rng.random(batch).astype(np.float32)
    inp.relevance = rng.random(batch).astype(np.float32)
    return inp


def _throughput(pipeline, inp, batch: int, iters: int, warmup: int) -> float:
    import jax

    inp = jax.device_put(inp)
    for _ in range(warmup):
        out, _ = pipeline.run_host(inp)
        # NOTE: under the axon tunnel block_until_ready returns before the
        # computation finishes; a host fetch is the only true sync, so all
        # timing below is fetch-based. run_host is the production serving
        # graph (5 output leaves instead of ~39 — each leaf mints a buffer
        # handle per dispatch under the tunnel).
        np.asarray(out["hostpack"])

    t0 = time.perf_counter()
    for _ in range(iters):
        out, _ = pipeline.run_host(inp)
    np.asarray(out["hostpack"])  # forces completion of the whole in-order queue
    dt = time.perf_counter() - t0
    return batch * iters / dt * SEGMENT_SECONDS


def _p50_latency(pipeline, models, tokens: int = 32) -> tuple[float, float]:
    """p50/p90 streaming-segment latency: batch 1 on the no-text (32-token)
    bucket — the exact device graph StreamingProcessor.process_segment
    dispatches (live streaming passes text="", D9-faithful). Protocol
    (VERDICT r2 #8): 2-warmup settle, then N=100 fetch-synchronized
    iterations, p50 and p90 reported."""
    import jax

    lat_inp = jax.device_put(_make_inputs(models, 1, tokens))
    for _ in range(2):
        out, _ = pipeline.run_host(lat_inp)
        np.asarray(out["hostpack"])
    time.sleep(1.0)  # let the in-order device queue fully drain
    lats = []
    for _ in range(100):
        t0 = time.perf_counter()
        out, _ = pipeline.run_host(lat_inp)
        np.asarray(out["hostpack"])
        lats.append((time.perf_counter() - t0) * 1000.0)
    return float(np.percentile(lats, 50)), float(np.percentile(lats, 90))


def _p50_process_segment(models, n: int = 100) -> tuple[float, float]:
    """The HONEST streaming latency (VERDICT r3 weak #4): wall time of
    ``StreamingProcessor.process_segment`` — PCM16 conversion, speaker match
    (diarizer embed), frame preprocess, tokenize-or-skip, device dispatch,
    the ONE device_get, and reference-schema output assembly — not just the
    device graph. Live streaming passes text="" (D9-faithful), so this is
    the exact per-segment cost a webcam+mic user pays."""
    import dataclasses

    from msa_tpu.core.config import SystemConfig
    from msa_tpu.processors.streaming import StreamingProcessor

    cfg = SystemConfig.from_env()
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, precompile=False)
    )
    proc = StreamingProcessor(config=cfg, models=models)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    sr = cfg.streaming.sample_rate
    t = np.arange(int(SEGMENT_SECONDS * sr)) / sr
    wav = 0.4 * np.sin(2 * np.pi * 150.0 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    audio = (np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes()

    for _ in range(3):  # compiles (B=1 bucket usually warm from _p50_latency)
        proc.process_segment([frame], audio, "")
    proc.timer.reset()
    lats = []
    for _ in range(n):
        t0 = time.perf_counter()
        proc.process_segment([frame], audio, "")
        lats.append((time.perf_counter() - t0) * 1000.0)
    # per-stage attribution of the host+device window cost (VERDICT r4
    # weak #5): mean ms per stage over the N timed iterations
    stages = {
        k: v["mean_ms"] for k, v in proc.timer.summary().items() if v["count"]
    }
    return (
        float(np.percentile(lats, 50)),
        float(np.percentile(lats, 90)),
        stages,
    )


def _make_synthetic_video(path: str, seconds: float, fps: float = 10.0) -> None:
    """480×640 mp4v video + a sidecar WAV with synthesized voiced audio so
    the full host path (cv2 decode, VAD/diarization, windowing) runs."""
    import cv2

    h, w = 480, 640
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    for i in range(int(seconds * fps)):
        frame = np.roll(base, shift=3 * i, axis=1)
        writer.write(frame)
    writer.release()

    sr = 16_000
    t = np.arange(int(seconds * sr)) / sr
    f0 = 140.0 + 20.0 * np.sin(2 * np.pi * 0.5 * t)
    voiced = sum(
        (0.4 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / sr) for k in (1, 2, 3)
    )
    envelope = 0.5 * (1.0 + np.sin(2 * np.pi * 0.3 * t))  # speech-like bursts
    wav = (voiced * envelope + 0.01 * rng.normal(size=t.shape)).astype(np.float32)

    from msa_tpu.host.audio_io import save_wav

    save_wav(os.path.splitext(path)[0] + ".wav", wav, sr)


def _e2e_process_video(models, seconds: float = 60.0, batch_size: int = 8) -> float:
    """End-to-end ``OfflineProcessor.process_video`` ×-realtime on a
    synthetic video (VERDICT r2 #10): real cv2 decode, diarization, audio
    windowing, device compute and fetch. Steady-state (second run timed;
    the first run owns any remaining compiles)."""
    import dataclasses
    import tempfile

    from msa_tpu.core.config import SystemConfig
    from msa_tpu.processors.offline import OfflineProcessor

    cfg = SystemConfig.from_env()
    # the warmup run below compiles exactly the shapes this video needs;
    # full-bucket precompile would burn bench budget on unused shapes
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, precompile=False)
    )
    with tempfile.TemporaryDirectory() as tmp:
        video = os.path.join(tmp, "bench_video.mp4")
        _make_synthetic_video(video, seconds)
        proc = OfflineProcessor(config=cfg, models=models, batch_size=batch_size)
        proc.process_video(video)  # warmup: compiles + cache priming
        t0 = time.perf_counter()
        proc.process_video(video)
        dt = time.perf_counter() - t0
    return seconds / dt


def main() -> None:
    signal.signal(signal.SIGTERM, _on_sigterm)

    tiny = bool(os.environ.get("MSA_BENCH_TINY"))  # dev smoke-test only
    if tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from msa_tpu.utils.jit_cache import enable_persistent_cache, extract_seed

    enable_persistent_cache()

    # a repo-shipped compile-cache seed (tools/make_cache_seed.py) warms a
    # fresh driver host when its fingerprint matches the build host —
    # without it the int8 kernel set never fit a cold-cache budget and the
    # record was structurally degraded (BENCH_r03/r04 postmortems)
    for mode in extract_seed(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "jit_cache_seed")
    ):
        _record_warm(mode)

    quantize = os.environ.get("MSA_QUANTIZE") or (
        "int8" if _cache_is_warm("int8") else "none"
    )
    skipped: list = []

    from msa_tpu.pipeline.graph import PipelineModels, SegmentPipeline

    t_init = time.perf_counter()
    if tiny:
        models = PipelineModels.tiny(seed=0)
        batch, iters, warmup_iters = 2, 2, 1
        buckets = (8, 16)
    else:
        models = PipelineModels.initialize(seed=0, quantize=quantize)
        batch, iters, warmup_iters = 64, 10, 2
        buckets = TOKEN_BUCKETS
    init_s = round(time.perf_counter() - t_init, 1)

    pipeline = SegmentPipeline(models)
    headline_tokens, rest = buckets[-1], buckets[:-1][::-1]

    # 1) HEADLINE first — 512-token worst case, batch 64 — then print a
    #    complete record immediately (round-2 rc=124 postmortem).
    t_shape0 = time.perf_counter()
    worst = round(
        _throughput(
            pipeline,
            _make_inputs(models, batch, headline_tokens),
            batch,
            iters,
            warmup_iters,
        ),
        2,
    )
    shape_cost = time.perf_counter() - t_shape0  # compile+measure of 1 shape
    _record.update(
        {
            "metric": "offline_video_seconds_per_sec_per_chip",
            "value": worst,
            "unit": "video-seconds/sec/chip",
            "vs_baseline": round(worst / TARGET_X_REALTIME, 3),
            "buckets": {str(headline_tokens): worst},
            "quantize": quantize,
            "degraded": quantize == "none" and "MSA_QUANTIZE" not in os.environ,
            "init_s": init_s,
        }
    )
    _emit()
    _record_warm(quantize)

    # 2) p50 device latency — UNCONDITIONAL (3 rounds, 0 driver-recorded p50;
    #    VERDICT r3 next #2). Its B=1 32-token graph is the smallest compile
    #    in the whole set, and half the north-star metric depends on it.
    try:
        p50, p90 = _p50_latency(pipeline, models, buckets[0])
        _record["p50_segment_latency_ms"] = round(p50, 2)
        _record["p90_segment_latency_ms"] = round(p90, 2)
        _emit()
    except Exception as e:  # noqa: BLE001 — extras never kill the record
        skipped.append(f"p50:{type(e).__name__}")

    # 3) remaining optional stages, each budget-gated against the measured
    #    per-shape cost (later shapes reuse in-process Mosaic kernel caches,
    #    so 0.75× is a conservative estimate).
    est = max(30.0, 0.75 * shape_cost)

    # honest streaming-path latency comes right after p50: its device graph
    # is the exact B=1/32-token graph p50 just warmed, so the only new
    # compiles are tiny host-side models (~tens of seconds) — cheapest
    # remaining stage by far, so it must not sit behind e2e's big compiles.
    if not tiny and _remaining() > 60.0:
        try:
            sp50, sp90, stages = _p50_process_segment(models)
            _record["p50_process_segment_ms"] = round(sp50, 2)
            _record["p90_process_segment_ms"] = round(sp90, 2)
            _record["p50seg_stages_ms"] = stages
            _emit()
        except Exception as e:  # noqa: BLE001
            skipped.append(f"p50seg:{type(e).__name__}")
    elif not tiny:
        skipped.append("p50seg:budget")

    # e2e (VERDICT r3 missing #2/#3: 3 rounds, 0 driver e2e records): its
    # warmup pass owns the processor's auto-sized batch compile plus — with
    # the shipped ASR now resolving by default — the whisper mel+decode
    # compiles. The gate is deliberately permissive (NOT est-scaled: est
    # reflects the 512-token headline compile, much bigger than e2e's
    # auto-sized B=16 graph): every _emit() already printed a complete
    # record and the SIGTERM handler re-emits, so an overrun costs only the
    # stages after it, never the record itself.
    if _remaining() > 90.0:
        try:
            # batch_size 8, NOT the headline's 64: a 60 s video is ~18 VAD
            # segments — B=8 gives three pipelined batches (decode ∥ device
            # ∥ fetch) instead of one monolithic dispatch with nothing to
            # overlap; measured 72.6 vs 65.9 ×-realtime (BASELINE round 5)
            x_rt = _e2e_process_video(
                models,
                seconds=15.0 if tiny else 60.0,
                batch_size=batch if tiny else 8,
            )
            _record["e2e_process_video_x_realtime"] = round(x_rt, 1)
            _emit()
        except Exception as e:  # noqa: BLE001
            skipped.append(f"e2e:{type(e).__name__}")
    else:
        skipped.append("e2e:budget")

    for tokens in rest:
        if _remaining() > est:
            try:
                # half the headline's iters: the bucket spectrum is COLOR
                # for the record (the headline stays the 512 worst case) and
                # 5 iterations of B=64 still measure 320 segments — two
                # rounds of `bucketNN:budget` skips were worse than a
                # slightly noisier spectrum (VERDICT r4 #4)
                _record["buckets"][str(tokens)] = round(
                    _throughput(
                        pipeline,
                        _make_inputs(models, batch, tokens),
                        batch,
                        max(iters // 2, 1),
                        warmup_iters,
                    ),
                    2,
                )
                _emit()
            except Exception as e:  # noqa: BLE001
                skipped.append(f"bucket{tokens}:{type(e).__name__}")
        else:
            skipped.append(f"bucket{tokens}:budget")

    # 4) int8 headline upgrade — only worth a shot with a GENEROUS budget
    #    (cold int8 kernel-set compile measured ~600 s in round 3; the
    #    default 420 s budget never fits it after the stages above). When it
    #    lands it both raises `value` and warms the cache for future rounds.
    if (
        not tiny
        and quantize == "none"
        and "MSA_QUANTIZE" not in os.environ
        and _remaining() > 600 + 2 * est
    ):
        try:
            models8 = PipelineModels.initialize(seed=0, quantize="int8")
            pipe8 = SegmentPipeline(models8)
            v8 = round(
                _throughput(
                    pipe8,
                    _make_inputs(models8, batch, headline_tokens),
                    batch,
                    iters,
                    warmup_iters,
                ),
                2,
            )
            _record_warm("int8")
            if v8 > _record["value"]:
                _record.update(
                    {
                        "value": v8,
                        "vs_baseline": round(v8 / TARGET_X_REALTIME, 3),
                        "quantize": "int8",
                        "degraded": False,
                    }
                )
                _record["buckets"][str(headline_tokens)] = v8
                _emit()
        except Exception as e:  # noqa: BLE001
            skipped.append(f"int8:{type(e).__name__}")

    if skipped:
        _record["skipped"] = skipped
        _emit()


if __name__ == "__main__":
    try:
        main()
    except Exception:
        if _headline_printed:
            # the driver record is already out; don't turn a good round into
            # a nonzero exit over an optional stage
            sys.exit(0)
        raise
