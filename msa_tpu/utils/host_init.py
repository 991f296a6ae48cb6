"""Host-side parameter initialization / checkpoint restore.

Eager flax ``Module.init`` (and msgpack template restores built on it)
dispatch hundreds of tiny ops one at a time. On a directly-attached device
that is merely untidy; through the axon TPU tunnel every dispatch is a
host↔device round trip and the flagship pipeline paid ~230 s of wall time
in ``PipelineModels.initialize`` alone (measured round 3: landmark 72 s,
audio 70 s, text 40 s, fusion restore 25 s) — the reason BENCH_r02 timed
out before printing anything.

The fix: run the init computation on the **host CPU backend** (JAX's
threefry PRNG is platform-deterministic, so the drawn parameters are
bit-identical — the shipped trained heads are validated against CPU-init
trunks by the test suite, which forces ``JAX_PLATFORMS=cpu``), then ship
the finished pytree to the accelerator in ONE batched transfer.

Pallas kernels inside the eagerly-executed init forward run in interpret
mode on the CPU backend; :func:`execution_platform` is default-device-aware
so the kernels pick interpret correctly inside an ``on_host`` region while
the production graph on the real chip keeps the compiled Mosaic path.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

__all__ = ["execution_platform", "on_host", "to_accelerator", "host_init"]


def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def execution_platform() -> str:
    """Platform eager ops execute on RIGHT NOW: honors an active
    ``jax.default_device(...)`` override, falling back to the priority
    backend (``jax.devices()[0]``)."""
    try:
        d = jax.config.jax_default_device
    except AttributeError:  # very old jax — no such config
        d = None
    if d is not None:
        # the config accepts a Device or a "platform[:index]" string
        return d.split(":")[0] if isinstance(d, str) else d.platform
    return jax.devices()[0].platform


def on_host(fn: Callable[..., Any], *args: Any, **kwargs: Any) -> Any:
    """Run ``fn`` with eager ops placed on the host CPU backend; the result
    pytree stays CPU-resident (use :func:`to_accelerator` / :func:`host_init`
    to move it)."""
    cpu = _cpu_device()
    if cpu is None or jax.devices()[0].platform == "cpu":
        return fn(*args, **kwargs)
    with jax.default_device(cpu):
        return fn(*args, **kwargs)


def to_accelerator(tree: Any) -> Any:
    """ONE batched transfer of a (host) pytree to the default device.

    Uncommitted/CPU/numpy leaves passed into a jitted call re-upload on
    EVERY invocation (~300 ms/call through the axon tunnel), so on a single
    accelerator params are pinned (committed) once, here. On the CPU backend
    (tests) or a multi-device setup the leaves stay UNCOMMITTED — pjit must
    remain free to place/shard them over the mesh (a committed single-device
    leaf next to mesh-sharded batch args is an error)."""
    devs = jax.devices()
    if devs[0].platform == "cpu" or len(devs) > 1:
        # identity for device-resident leaves; one-time upload for numpy
        return jax.device_put(tree)
    return jax.device_put(tree, devs[0])


def host_init(fn: Callable[..., Any], *args: Any, **kwargs: Any) -> Any:
    """``to_accelerator(on_host(fn, ...))`` — the standard recipe for every
    ``init_params`` / checkpoint loader in this package."""
    return to_accelerator(on_host(fn, *args, **kwargs))
