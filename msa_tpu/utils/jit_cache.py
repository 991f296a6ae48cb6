"""Persistent XLA compilation cache, enabled once per process.

The production encoders' fused Pallas kernels (attention block, FFN) take
minutes to compile cold on a 1-core host — measured ~5 min for one
(batch, tokens) shape of the full pipeline. Mosaic caches identical kernels
in-process (extra layers are free), and this module adds the cross-process
half: identical executables hit a disk cache, so repeat invocations of
bench/CLI/driver entry points spend their wall clock running, not compiling.

The cache directory is keyed by a HOST FINGERPRINT (CPU feature set + jax
version + platform selection): XLA:CPU AOT entries compiled on a machine
with different CPU features are rejected at load time with pages of
``cpu_aot_loader`` "machine features ... SIGILL" warnings (round-3 driver
postmortem — the warnings polluted official artifacts and made a cold cache
look warm). Per-host directories mean a foreign host's entries are never
even visited.

Never overrides a cache dir the process already configured (tests set their
own in tests/conftest.py).
"""

from __future__ import annotations

import os
import tempfile

# per-user default: a world-shared fixed path breaks on multi-user machines
# (the second user can't write the first user's directory)
_DEFAULT_DIR = os.path.join(
    tempfile.gettempdir(), f"msa_tpu_jit_cache_tpu_{os.getuid()}"
)


def host_fingerprint() -> str:
    """Identity of what makes persisted XLA executables loadable HERE:
    jax version + platform selection + the host CPU feature set. Cheap and
    import-safe — does NOT initialize a jax backend."""
    import hashlib

    import jax

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    raw = "|".join([jax.__version__, os.environ.get("JAX_PLATFORMS", ""), flags])
    return hashlib.sha256(raw.encode()).hexdigest()[:16]


def cache_dir(path: str | None = None) -> str:
    """The effective per-host cache directory ("" when disabled)."""
    base = path or os.environ.get("MSA_JIT_CACHE", _DEFAULT_DIR)
    if not base:
        return ""
    return os.path.join(base, host_fingerprint())


def enable_persistent_cache(path: str | None = None) -> None:
    """Idempotent; a no-op when a cache dir is already configured or the
    jax version lacks the option. ``MSA_JIT_CACHE`` overrides the default
    base location; ``MSA_JIT_CACHE=""`` disables."""
    import jax

    cache = cache_dir(path)
    if not cache:
        return
    try:
        if jax.config.jax_compilation_cache_dir:  # someone configured one
            return
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is an optimization, never a requirement
        pass
