"""Checkpointing: best-score model snapshots per (language, task[, step]) —
path layout compatible with the reference
(``saved_models/{exp_name}/{lan}_{taski}[_{step}]_best_score`` with a .msgpack
suffix; reference: il_modules/base.py:328-332, mrn.py:411-415).

Serialization uses flax msgpack (host-synchronous, small models).  Unlike the
reference (which loses optimizer/scheduler state), ``save_train_state`` can
also persist opt_state + step for finer-grained resume.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import flax.serialization
import jax

__all__ = ["save_model", "load_model", "best_model_path",
           "train_state_path", "save_train_state", "load_train_state"]


def best_model_path(output_dir: str, exp_name: str, lan: str, taski: int,
                    step: Optional[int] = None) -> str:
    suffix = f"_{step}" if step is not None else ""
    return os.path.join(output_dir, exp_name,
                        f"{lan}_{taski}{suffix}_best_score.msgpack")


def save_model(path: str, params: Any, batch_stats: Any,
               extra: Optional[dict] = None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"params": params, "batch_stats": batch_stats}
    if extra:
        payload.update(extra)
    payload = jax.device_get(payload)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))


def load_model(path: str, template: Optional[dict] = None) -> dict:
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    if template is not None:
        payload = flax.serialization.from_state_dict(template, payload)
    return payload


# ---------------------------------------------------------------- full state
# SURVEY §5: the reference loses optimizer/scheduler/loader state on a crash
# (il_modules/base.py:328-332 saves model weights only), so resume granularity
# is a whole task.  The rebuild's full-state checkpoint captures everything a
# mid-stage resume needs for a *bitwise* continuation:
#   device side — params, batch_stats, opt_state (incl. the OneCycle counter
#                 inside optax's scale_by_schedule state), step;
#   host side   — jax PRNG key, numpy Generator state, rehearsal memory_index,
#                 best_score.
# The data stream needs no serialization at all: every loop iteration consumes
# exactly one index-draw per loader from the manager's seeded Generator, so a
# resume replays the (cheap, deterministic) task-start path and then
# fast-forwards `iteration` draws via DatasetManager.skip_batches — no images
# are materialized while skipping.


def train_state_path(output_dir: str, exp_name: str, lan: str, taski: int,
                     step: Optional[int] = None) -> str:
    suffix = f"_{step}" if step is not None else ""
    return os.path.join(output_dir, exp_name,
                        f"{lan}_{taski}{suffix}_train_state.msgpack")


def save_train_state(path: str, *, params: Any, batch_stats: Any,
                     opt_state: Any, iteration: int, rng_key: Any,
                     host_state: dict, extra: Optional[dict] = None):
    """Atomic (write-then-rename) rolling snapshot of the full training
    state.  ``host_state`` is an arbitrary picklable dict (numpy Generator
    state, memory indices, ...)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": flax.serialization.to_state_dict(opt_state),
        "iteration": iteration,
        "rng_key": rng_key,
    }
    if extra:
        payload.update(extra)
    payload = jax.device_get(payload)
    payload["host_state"] = pickle.dumps(host_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def prune_named_subtrees(state_dict: dict, name: str) -> dict:
    """Recursively drop every subtree keyed ``name`` from a nested state
    dict (e.g. the frozen 'experts' stack and its zeroed Adam moments in an
    MRN router-phase snapshot — reconstructable by replay, ~100x the bytes
    of the router itself)."""
    out = {}
    for k, v in state_dict.items():
        if k == name:
            continue
        out[k] = prune_named_subtrees(v, name) if isinstance(v, dict) else v
    return out


def deep_merge(base: dict, overlay: dict) -> dict:
    """Overlay a partial nested state dict onto a template, in place."""
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_merge(base[k], v)
        else:
            base[k] = v
    return base


def load_train_state(path: str, opt_state_template: Any = None) -> dict:
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    payload["host_state"] = pickle.loads(payload["host_state"])
    if opt_state_template is not None:
        payload["opt_state"] = flax.serialization.from_state_dict(
            opt_state_template, payload["opt_state"])
    payload["iteration"] = int(payload["iteration"])
    return payload
