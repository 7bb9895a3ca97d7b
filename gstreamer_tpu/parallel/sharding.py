"""Multi-chip scaling: device meshes and frame/batch sharding.

The reference is a single-node framework whose parallelism is streaming
threads + row-slicing (GstParallelizedTaskRunner, video-converter.c:121-196).
The TPU-native equivalents (SURVEY §2.8):

* batch axis  -> data-parallel sharding over the mesh ("dp")
* frame rows  -> spatial sharding for frames too large for one chip's
  working set ("sp"), with halo exchange sized by the tap overlap —
  handled by XLA collectives when the converter runs under shard_map.

This module holds the mesh/sharding helpers used by pipelines and by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis mesh")
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis, replicate the rest."""
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batched_pytree(mesh: Mesh, tree: Any, axis: str = "dp") -> Any:
    """Device-put every leaf with its batch axis sharded over `axis`."""
    def place(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis))
    return jax.tree_util.tree_map(place, tree)


def row_sharding(mesh: Mesh, ndim: int, row_axis: int,
                 axis: str = "sp") -> NamedSharding:
    """Shard a spatial (row) axis — the sequence-parallel analog for
    frames whose working set exceeds one chip (SURVEY §5 long-context)."""
    spec = [None] * ndim
    spec[row_axis] = axis
    return NamedSharding(mesh, P(*spec))
