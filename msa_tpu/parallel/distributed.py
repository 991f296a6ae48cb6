"""Multi-host (multi-process) initialization and global meshes.

SURVEY §2.10's communication-backend plan has two halves: intra-slice
collectives ride **ICI** (handled by `msa_tpu.parallel.mesh` — XLA inserts
psum/all-gather from NamedShardings), and multi-host jobs coordinate over
**DCN** via the jax distributed runtime. This module is the DCN half: a thin,
env-var-friendly wrapper over ``jax.distributed.initialize`` plus a
host-topology-aware global mesh builder.

Single-process callers never need this file — ``make_mesh`` over local
devices (real or CPU-emulated) is the default everywhere else. Multi-host
behavior cannot be exercised in the single-host build/test environment; the
argument handling and mesh construction below are unit-tested on the
emulated mesh, and the initialize call is the documented standard sequence.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

from msa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    autodetect: bool = False,
) -> bool:
    """Join (or skip joining) a multi-host jax job.

    Arguments default to the standard env vars (``MSA_COORDINATOR``,
    ``MSA_NUM_PROCESSES``, ``MSA_PROCESS_ID``). On TPU pods
    ``jax.distributed.initialize()`` autodetects everything from the TPU
    metadata server — request that path explicitly with ``autodetect=True``
    (or ``MSA_MULTIHOST=auto``); it is not the default because on a dev
    machine a bare initialize() blocks waiting for a coordinator. Returns
    True when a multi-process runtime was initialized, False for the
    single-process fallback — callers can branch on it but normally don't
    need to: ``jax.devices()`` is global either way.
    """
    coordinator_address = coordinator_address or os.environ.get("MSA_COORDINATOR")
    if num_processes is None and "MSA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MSA_NUM_PROCESSES"])
    if process_id is None and "MSA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MSA_PROCESS_ID"])
    autodetect = autodetect or os.environ.get("MSA_MULTIHOST") == "auto"

    given = (coordinator_address, num_processes, process_id)
    if any(v is not None for v in given) and None in given:
        raise ValueError(
            "multi-host init needs all three of coordinator_address, "
            f"num_processes, process_id (got {given}); set the missing "
            "MSA_COORDINATOR / MSA_NUM_PROCESSES / MSA_PROCESS_ID env vars"
        )
    if coordinator_address is None:
        if autodetect:
            jax.distributed.initialize()  # TPU-pod metadata autodetection
            return True
        return False  # single-process (the normal dev/test path)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(n_model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """(data × model) mesh over ALL devices of the (possibly multi-host) job,
    laid out so the ``model`` axis stays WITHIN a host: tensor-parallel
    collectives then ride ICI while only data-parallel gradient psums cross
    DCN — the axis-to-fabric mapping the scaling playbook prescribes.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_model < 1:
        raise ValueError("n_model must be >= 1")
    by_process: dict = {}
    for d in devices:
        by_process.setdefault(getattr(d, "process_index", 0), []).append(d)
    ordered = []
    for pid in sorted(by_process):
        local = by_process[pid]
        if len(local) % n_model:
            raise ValueError(
                f"host {pid} has {len(local)} devices, not divisible by "
                f"n_model={n_model} — the model axis must not span hosts"
            )
        ordered.extend(local)
    return make_mesh(n_data=-1, n_model=n_model, devices=ordered)
