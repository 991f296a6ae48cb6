"""Native host runtime (C++ via ctypes) tests, with fallback-equivalence."""

import numpy as np
import pytest

from msa_tpu.runtime import (
    NativeRingBuffer,
    native_available,
    pcm16_to_f32,
    slice_windows,
)


def test_native_builds_and_loads():
    assert native_available(), "g++ build of msa_runtime.cpp failed"


def test_pcm16_conversion(rng):
    pcm = rng.integers(-32768, 32767, size=1000, dtype=np.int16)
    got = pcm16_to_f32(pcm)
    np.testing.assert_allclose(got, pcm.astype(np.float32) / 32768.0, atol=0)


def test_slice_windows_pad_truncate_clamp(rng):
    wav = rng.normal(size=1000).astype(np.float32)
    starts = np.asarray([0, 900, -50, 400], np.int64)
    ends = np.asarray([100, 1100, 50, 400], np.int64)
    out = slice_windows(wav, starts, ends, 200)
    assert out.shape == (4, 200)
    np.testing.assert_array_equal(out[0, :100], wav[:100])
    np.testing.assert_array_equal(out[0, 100:], 0)
    np.testing.assert_array_equal(out[1, :100], wav[900:])  # clamped end
    np.testing.assert_array_equal(out[1, 100:], 0)
    np.testing.assert_array_equal(out[2, :50], wav[:50])  # clamped start
    np.testing.assert_array_equal(out[3], 0)  # empty range


def test_slice_windows_truncates_long_segment(rng):
    wav = rng.normal(size=1000).astype(np.float32)
    out = slice_windows(wav, np.asarray([0], np.int64), np.asarray([1000], np.int64), 300)
    np.testing.assert_array_equal(out[0], wav[:300])


def test_ring_buffer_fifo(rng):
    ring = NativeRingBuffer(256)
    a = rng.normal(size=100).astype(np.float32)
    b = rng.normal(size=50).astype(np.float32)
    assert ring.push(a) == 0
    assert ring.push(b) == 0
    assert len(ring) == 150
    got = ring.pop(120)
    np.testing.assert_array_equal(got, np.concatenate([a, b])[:120])
    np.testing.assert_array_equal(ring.drain(), np.concatenate([a, b])[120:])
    assert len(ring) == 0


def test_ring_buffer_drops_oldest_on_overflow(rng):
    ring = NativeRingBuffer(100)
    x = np.arange(250, dtype=np.float32)
    dropped = ring.push(x[:150])  # 50 dropped immediately (cap 100)
    dropped += ring.push(x[150:])
    assert dropped == 150
    got = ring.drain()
    np.testing.assert_array_equal(got, x[150:])


def test_ring_buffer_threaded_producer():
    import threading

    ring = NativeRingBuffer(1 << 16)
    total = 20_000

    def producer():
        for i in range(0, total, 500):
            ring.push(np.full(500, float(i), np.float32))

    t = threading.Thread(target=producer)
    t.start()
    collected = 0
    while collected < total:
        collected += ring.pop(1024).shape[0]
        if not t.is_alive() and len(ring) == 0 and collected < total:
            break
    t.join()
    assert collected == total


def test_ring_buffer_under_thread_sanitizer(tmp_path):
    """Race detection (SURVEY §5): build the SPSC ring + stress harness with
    -fsanitize=thread and require a clean run (no TSan reports, all samples
    in order)."""
    import shutil
    import subprocess
    from pathlib import Path

    if not shutil.which("g++"):
        pytest.skip("no g++")
    native = Path("msa_tpu/runtime/native")
    binary = tmp_path / "ring_tsan"
    build = subprocess.run(
        [
            "g++", "-O1", "-g", "-std=c++17", "-fsanitize=thread",
            str(native / "ring_stress.cpp"), str(native / "msa_runtime.cpp"),
            "-o", str(binary), "-lpthread",
        ],
        capture_output=True,
        timeout=180,
    )
    if build.returncode != 0:
        pytest.skip(f"tsan build unavailable: {build.stderr.decode()[:200]}")
    run = subprocess.run([str(binary)], capture_output=True, timeout=300)
    stderr = run.stderr.decode()
    assert "ThreadSanitizer" not in stderr, stderr[:2000]
    assert run.returncode == 0, (run.stdout.decode(), stderr[:2000])
    assert b"OK" in run.stdout
