"""Multi-host (multi-process) initialization — DCN scaling for the same
single-program data-parallel design (SURVEY.md §2 C23: the reference is
single-process DataParallel; the TPU-native equivalent scales over hosts via
jax.distributed with NO program change).

Usage (one call per process, before any backend use):

    from mrn_tpu.parallel import multihost
    multihost.initialize(coordinator_address="host0:9999",
                         num_processes=4, process_id=rank)
    set_data_parallel()            # mesh over the GLOBAL device list

Every process then assembles the same global batch (loaders are seeded
identically) and ``shard_batch``'s device_put slices out the locally
addressable shard — the documented JAX global-array pattern.  On TPU pods the
arguments are inferred from the environment, so ``initialize()`` suffices.
"""

from __future__ import annotations

from typing import Optional

__all__ = ["initialize", "is_initialized"]

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None):
    """jax.distributed.initialize wrapper; returns (process_index,
    process_count).  Arguments default to environment auto-detection
    (TPU pods / JAX_COORDINATOR_ADDRESS etc.)."""
    global _INITIALIZED
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def is_initialized() -> bool:
    return _INITIALIZED
