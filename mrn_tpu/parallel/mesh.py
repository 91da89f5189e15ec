"""Device-mesh data parallelism — the TPU-native replacement for the
reference's single-process torch.nn.DataParallel (reference:
il_modules/base.py:68; SURVEY.md §2 C23).

Design: one jitted train step; the batch is sharded over the 'data' mesh axis
with NamedSharding and parameters are replicated.  XLA partitions the program
and inserts the psum gradient all-reduce over ICI — no per-step replicate/
scatter/gather like DataParallel.  Multi-host runs use the same program after
``jax.distributed.initialize`` (collectives span ICI then DCN).

The module is a process-global switch so learners stay mesh-agnostic:
``set_data_parallel(n)`` installs a mesh, ``shard_batch`` annotates batch
arrays, and everything else follows from XLA propagation.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["set_data_parallel", "get_mesh", "shard_batch", "replicate"]

_MESH: Optional[Mesh] = None


def set_data_parallel(num_devices: Optional[int] = None, devices=None):
    """Install a 1-D 'data' mesh over the first num_devices devices
    (default: all).  Pass num_devices=1 (or None with one device) to disable."""
    global _MESH
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if len(devices) <= 1:
        _MESH = None
        return None
    _MESH = Mesh(np.array(devices), axis_names=("data",))
    return _MESH


def get_mesh() -> Optional[Mesh]:
    return _MESH


def shard_batch(x):
    """Annotate a batch-leading array as sharded over the 'data' axis.
    Identity when no mesh is installed."""
    if _MESH is None:
        return x
    return jax.device_put(x, NamedSharding(_MESH, P("data")))


def replicate(tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    if _MESH is None:
        return tree
    sharding = NamedSharding(_MESH, P())
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, sharding), tree)
