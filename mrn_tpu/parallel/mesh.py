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

__all__ = ["set_data_parallel", "set_expert_parallel", "get_mesh",
           "shard_batch", "shard_experts", "replicate", "gather_for_host"]

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


def set_expert_parallel(expert: int, data: Optional[int] = None, devices=None):
    """Install a 2-D (data × expert) mesh: MRN's stacked-expert axis is
    sharded over 'expert' devices and the batch over 'data' devices (XLA
    inserts the gathers for the router combine).  expert=1 falls back to the
    1-D data mesh."""
    global _MESH
    if devices is None:
        devices = jax.devices()
    if expert <= 1:
        return set_data_parallel(data, devices=devices)
    if data is None:
        data = max(1, len(devices) // expert)
    if data * expert > len(devices):
        raise ValueError(f"need {data}x{expert} devices, have {len(devices)}")
    _MESH = Mesh(np.array(devices[:data * expert]).reshape(data, expert),
                 axis_names=("data", "expert"))
    return _MESH


def get_mesh() -> Optional[Mesh]:
    return _MESH


def shard_batch(x):
    """Annotate a batch-leading array as sharded over the 'data' axis.
    Identity when no mesh is installed."""
    if _MESH is None:
        return x
    return jax.device_put(x, NamedSharding(_MESH, P("data")))


def shard_experts(tree, n_experts: int):
    """Place a stacked-expert pytree: leaves with a leading axis of size
    ``n_experts`` are sharded over the 'expert' mesh axis (when divisible),
    everything else replicated.  Identity without an expert mesh axis."""
    if _MESH is None or "expert" not in _MESH.axis_names:
        return tree
    n_shards = dict(_MESH.shape)["expert"]
    expert_s = NamedSharding(_MESH, P("expert"))
    full_s = NamedSharding(_MESH, P())

    def place(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == n_experts \
                and n_experts % n_shards == 0:
            return jax.device_put(leaf, expert_s)
        return jax.device_put(leaf, full_s)

    return jax.tree_util.tree_map(place, tree)


def gather_for_host(tree):
    """Constrain a jitted function's outputs to fully-replicated layout.
    Multi-host runs shard eval batches over the global mesh, so outputs the
    host must read (greedy indices, max-probs) would otherwise span
    non-addressable devices and np.asarray would fail; the constraint makes
    XLA all-gather them inside the program.  Identity without a mesh (and a
    no-op partition-wise on single-host meshes, where outputs are already
    addressable)."""
    if _MESH is None:
        return tree
    import jax.lax
    sharding = NamedSharding(_MESH, P())
    return jax.tree_util.tree_map(
        lambda l: jax.lax.with_sharding_constraint(l, sharding), tree)


def replicate(tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    if _MESH is None:
        return tree
    sharding = NamedSharding(_MESH, P())
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, sharding), tree)
