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
