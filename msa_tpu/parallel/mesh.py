"""Device mesh and sharding utilities.

The reference is single-process/single-device — it has NO parallelism of any
kind (SURVEY.md §2.10: sequential segment loop offline_processor.py:254-257,
one DataLoader train_fusion_model.py:152-153). This module is the rebuild's
topology layer: everything above it is mesh-agnostic.

Design (TPU-first):
- primary axis ``data``: diarized segments / training batches shard across
  chips; gradients are combined by XLA-inserted psums (jit over NamedSharding
  — no hand-written collectives needed on this path).
- secondary axis ``model``: tensor-parallel shardings for the encoder weights
  (BERT/audio trunks) — applied via parameter PartitionSpec rules.
- single-chip and CPU-emulated multi-chip (xla_force_host_platform_device_count)
  are the same code path.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int = -1,
    n_model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a (data, model) mesh. ``n_data=-1`` consumes all remaining
    devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_model < 1:
        raise ValueError("n_model must be >= 1")
    if n_data == -1:
        n_data = len(devices) // n_model
    used = n_data * n_model
    if used > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {used} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:used]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_parallel_mesh(devices: Optional[Sequence[Any]] = None) -> Mesh:
    return make_mesh(n_data=-1, n_model=1, devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (segment/batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Pad the leading axis of every array in ``batch`` to a multiple of the
    data-axis size and place it with a data-parallel sharding. Returns
    (sharded_batch, real_count)."""
    n_data = mesh.shape[DATA_AXIS]
    leaves = jax.tree.leaves(batch)
    if not leaves:
        return batch, 0
    real = leaves[0].shape[0]
    padded = pad_to_multiple(max(real, 1), n_data)

    def _pad(x):
        if x.shape[0] == padded:
            return x
        pad_width = [(0, padded - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)

    batch = jax.tree.map(_pad, batch)
    sharding = batch_sharding(mesh)
    batch = jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return batch, real


def encoder_param_spec(path: Tuple[str, ...], leaf) -> P:
    """Tensor-parallel PartitionSpec rule for transformer encoder params.

    Megatron-style sharding: attention QKV and MLP-in kernels shard their
    output features over ``model``; attention-out and MLP-out kernels shard
    their input features; everything else (embeddings, LayerNorms, biases of
    row-sharded layers) replicates. Matching is by parameter-path substring so
    it applies to any of our Flax encoders.

    Note on the fused Pallas kernels: with ``n_model > 1`` use
    ``attention_impl="einsum"`` / ``ffn_impl="dense"`` encoder configs (the
    tp correctness tests and the driver dryrun do) — GSPMD partitions plain
    dots natively, while a pallas_call has no partitioning rule, so XLA would
    gather the sharded operands around it. Data-parallel-only meshes
    (``n_model == 1``, the production serving layout) keep the fused kernels:
    every weight PartitionSpec is replicated and the batch axis shards
    cleanly over the kernel's grid.
    """
    name = "/".join(str(p) for p in path).lower()
    ndim = getattr(leaf, "ndim", 0)
    if ndim < 2:
        return P()
    if any(k in name for k in ("query", "key", "value", "qkv", "fc_in", "intermediate")):
        return P(None, MODEL_AXIS)  # column parallel
    if any(k in name for k in ("attn_out", "out_proj", "fc_out", "output_dense")):
        return P(MODEL_AXIS, None)  # row parallel
    return P()


def shard_encoder_params(mesh: Mesh, params: Any) -> Any:
    """Apply :func:`encoder_param_spec` over a param pytree."""

    def _place(path, leaf):
        spec = encoder_param_spec(tuple(k.key for k in path), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(_place, params)
