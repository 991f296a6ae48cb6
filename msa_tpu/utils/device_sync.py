"""Serialized device fetches for multi-threaded host paths.

The axon tunnel client deadlocks when two host threads block inside
``jax.Array._value`` (a device→host fetch) at the same time — observed
twice in round 5's overlapped pipelines (faulthandler stack dumps: the
diarizer label thread's embed fetch and the main thread's whisper fetch,
both parked in ``_value`` forever). Dispatches (async enqueue) have never
wedged; only concurrent BLOCKING fetches have.

Every fetch that can run on a non-main thread (diarizer embed, whisper
collect, the offline hostpack fetch worker) therefore serializes through
:data:`FETCH_LOCK` via :func:`fetch`. Fetches still overlap with other
threads' dispatches and host compute — only fetch-vs-fetch is serialized,
which costs nothing: the tunnel processes one transfer at a time anyway.
"""

from __future__ import annotations

import threading

import numpy as np

FETCH_LOCK = threading.Lock()


def fetch(arr) -> "np.ndarray":
    """device array → host numpy under the process-wide fetch lock."""
    with FETCH_LOCK:
        return np.asarray(arr)


def fetch_tree(tree):
    """jax.device_get under the fetch lock (pytrees / single leaves)."""
    import jax

    with FETCH_LOCK:
        return jax.device_get(tree)
