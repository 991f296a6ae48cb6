"""Profiling utilities tests."""

import time

import numpy as np

from msa_tpu.utils.profiling import StageTimer, fetch_timed


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0.02
    assert s["b"]["count"] == 1
    t.log_summary()  # must not raise


def test_stage_timer_counts_exceptions():
    t = StageTimer()
    try:
        with t.stage("x"):
            raise ValueError("boom")
    except ValueError:
        pass
    assert t.summary()["x"]["count"] == 1


def test_fetch_timed_returns_output_and_time():
    import jax.numpy as jnp

    def fn(x):
        return jnp.sum(x * 2)

    out, dt = fetch_timed(fn, jnp.ones(16), iters=3)
    assert float(np.asarray(out)) == 32.0
    assert dt >= 0.0


def test_cache_seed_roundtrip(tmp_path, monkeypatch):
    """make_seed packs this host's cache entries; extract_seed restores
    them on a fingerprint match and refuses a mismatch (the driver-host
    warm-bench mechanism, VERDICT r4 #2)."""
    from msa_tpu.utils import jit_cache as jc

    cache_base = tmp_path / "cache"
    monkeypatch.setenv("MSA_JIT_CACHE", str(cache_base))
    src = jc.cache_dir()
    import os

    os.makedirs(src, exist_ok=True)
    (pathlib := __import__("pathlib")).Path(src, "jit_x-abc-cache").write_bytes(
        b"\x01\x02"
    )

    seed = tmp_path / "seed"
    meta = jc.make_seed(str(seed), modes=["int8"])
    assert meta["n_entries"] == 1
    assert meta["fingerprint"] == jc.host_fingerprint()

    # extraction into a FRESH cache dir restores the entry
    monkeypatch.setenv("MSA_JIT_CACHE", str(tmp_path / "cache2"))
    assert jc.extract_seed(str(seed)) == ["int8"]
    assert pathlib.Path(jc.cache_dir(), "jit_x-abc-cache").read_bytes() == b"\x01\x02"
    # an existing newer entry is never clobbered
    pathlib.Path(jc.cache_dir(), "jit_x-abc-cache").write_bytes(b"\x09")
    assert jc.extract_seed(str(seed)) == ["int8"]
    assert pathlib.Path(jc.cache_dir(), "jit_x-abc-cache").read_bytes() == b"\x09"

    # fingerprint mismatch → refused
    import json

    m = json.loads((seed / "meta.json").read_text())
    m["fingerprint"] = "deadbeef00000000"
    (seed / "meta.json").write_text(json.dumps(m))
    assert jc.extract_seed(str(seed)) == []
    # no seed at all → []
    assert jc.extract_seed(str(tmp_path / "nope")) == []
