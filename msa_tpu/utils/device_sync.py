"""Serialized device interaction for multi-threaded host paths.

The axon tunnel client wedges PERMANENTLY (not merely serializes) when two
host threads interact with the device at the same time in specific
combinations, observed via faulthandler stack dumps in round 5:

1. two threads blocking in ``jax.Array._value`` (device→host fetch)
   concurrently;
2. a worker-thread fetch issued while the main thread has a jit COMPILE
   RPC in flight (the label thread's embed fetch during the whisper
   B=8 cold compile never returned).

Every device interaction reachable from more than one thread therefore
serializes through :data:`DEVICE_LOCK` (an RLock): fetches hold it for
their blocking duration; dispatches hold it for the enqueue (microseconds
warm, the whole compile when cold — exactly what rule 2 requires).

What still overlaps — and is the entire point of the threaded pipelines —
is device work vs HOST compute: cv2 decode, VAD, tokenize, resize all run
while another thread waits inside a fetch. The tunnel moves one transfer
at a time anyway, so fetch-vs-fetch serialization costs nothing.
"""

from __future__ import annotations

import threading

import numpy as np

DEVICE_LOCK = threading.RLock()


def fetch(arr) -> "np.ndarray":
    """device array → host numpy under the process-wide device lock."""
    with DEVICE_LOCK:
        return np.asarray(arr)


def fetch_tree(tree):
    """jax.device_get under the device lock (pytrees / single leaves)."""
    import jax

    with DEVICE_LOCK:
        return jax.device_get(tree)


def device_call(fn, *args, **kwargs):
    """Run a dispatch/compile-capable callable under the device lock."""
    with DEVICE_LOCK:
        return fn(*args, **kwargs)


_FETCH_POOL = None
_FETCH_POOL_GUARD = threading.Lock()


def fetch_executor():
    """The process-wide device-I/O worker: ONE long-lived thread, created
    lazily and WARMED with a trivial round trip, through which every
    worker-side fetch routes (offline hostpack fetches, whisper collects,
    diarizer label finalize, streaming speaker match).

    Rationale (watchdog dumps #4/#5, round 5): the FIRST tunnel contact
    from a freshly created thread intermittently stalls ~5 minutes with the
    device idle — a connection-setup pathology in the tunnel client (the
    ~300 s resolution smells like a TCP-level timeout). Established
    connections never exhibit it. Per-video/per-processor throwaway worker
    threads made that a recurring roulette; one shared pre-warmed thread
    pays the risk at most once, at startup, while the tunnel is quiet."""
    global _FETCH_POOL
    with _FETCH_POOL_GUARD:
        if _FETCH_POOL is None:
            import concurrent.futures

            pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="msa-devio"
            )
            try:  # warm the worker's tunnel connection with a tiny fetch
                import jax

                x = device_call(jax.device_put, np.zeros(1, np.float32))
                pool.submit(fetch, x).result(timeout=600)
            except Exception:  # no device / cpu-only: the pool still works
                pass
            _FETCH_POOL = pool
    return _FETCH_POOL
