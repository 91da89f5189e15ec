"""Config system: loads reference-style Python config files (dicts named
``common`` / ``model`` / ``optimizer`` / ``train`` [+ ``test``]) and flattens
them into one options namespace, exactly like the reference driver
(reference: tiny_train.py:407-422, test.py:460-473) — so the reference's
``config/*_{mrn,der}.py`` files work unchanged.

No mmcv dependency: config files are plain Python modules executed in an
isolated namespace.
"""

from __future__ import annotations

import copy
import runpy
import types
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

__all__ = ["Options", "load_config", "default_options", "TINY_TEST_OVERRIDES"]

_SECTION_ORDER = ("common", "model", "train", "optimizer")  # merge order of tiny_train.py:413-419


class Options(types.SimpleNamespace):
    """Flat options namespace (the reference's ``opt``)."""

    def replace(self, **kw) -> "Options":
        new = copy.deepcopy(vars(self))
        new.update(kw)
        return Options(**new)

    def get(self, key: str, default: Any = None) -> Any:
        return vars(self).get(key, default)


# Defaults covering the full public config surface (reference: config/crnn_mrn.py:1-67).
_DEFAULTS: Dict[str, Any] = dict(
    # common
    exp_name="exp",
    il="base",
    memory=None,
    memory_num=2000,
    batch_max_length=25,
    imgH=32,
    imgW=256,
    manual_seed=111,
    start_task=0,
    # model
    model_name="CRNN",
    Transformation="None",
    FeatureExtraction="VGG",
    SequenceModeling="BiLSTM",
    Prediction="CTC",
    num_fiducial=20,
    input_channel=4,
    output_channel=512,
    hidden_size=256,
    # optimizer
    schedule="super",
    optimizer="adam",
    lr=0.0005,
    sgd_momentum=0.9,
    sgd_weight_decay=0.000001,
    milestones=[2000, 4000],
    lrate_decay=0.1,
    rho=0.95,
    eps=1e-8,
    lr_drop_rate=0.1,
    # train
    saved_model="",
    Aug="None",
    workers=0,
    lan_list=["Chinese", "Latin", "Japanese", "Korean", "Arabic", "Bangla"],
    valid_datas=[],
    select_data=[],
    batch_ratio="0.5-0.5",
    total_data_usage_ratio="1.0",
    NED=True,
    batch_size=256,
    num_iter=10000,
    val_interval=5000,
    log_multiple_test=None,
    grad_clip=5,
    # framework extensions (TPU build only; absent from reference configs)
    compute_dtype="float32",     # "bfloat16" for perf runs
    data_parallel=1,              # number of devices for batch sharding
    expert_parallel=1,            # devices for MRN's stacked-expert axis
    router_labels="reference",   # "reference" = memory-vs-current binary CE targets
    #                               (quirk of data_manage.py IndexConcatDataset nesting);
    #                               "task" = true per-task expert labels.
    mrn_pin_expert_stats=True,   # run the frozen ensemble in inference mode during
    #                               router training (no BN running-stat drift).
    #                               False reproduces the reference quirk where val()
    #                               flips frozen experts back to .train()
    #                               (il_modules/mrn.py:401) and their stats slide
    #                               toward the mixed rehearsal stream.
    full_ckpt=False,             # rolling full-state snapshot (params + opt
    #                               state + PRNG + memory indices) at each val
    #                               boundary — iteration-granular crash
    #                               recovery (SURVEY §5; the reference only
    #                               saves model weights, base.py:328-332)
    resume_full=False,           # resume mid-stage from the rolling snapshot
    #                               (bitwise continuation; pairs with the
    #                               campaign's coarse start_task replay)
    output_dir="./saved_models",
    data_log="./data_any.txt",
)

# Shrunk dims used by the unit-test suite (single CPU core budget).
TINY_TEST_OVERRIDES: Dict[str, Any] = dict(
    imgW=64,
    output_channel=64,
    hidden_size=32,
    batch_size=8,
    num_iter=4,
    val_interval=2,
    memory_num=8,
    num_fiducial=8,
)


def default_options(**overrides) -> Options:
    merged = copy.deepcopy(_DEFAULTS)
    merged.update(overrides)
    return Options(**merged)


def load_config(path: str, extra_sections: Optional[List[str]] = None, **overrides) -> Options:
    """Execute a reference-style config file and flatten its section dicts.

    ``extra_sections`` may add e.g. ``["test"]`` (reference: test.py:467-473).
    ``overrides`` are applied last (useful for CLI flags / tests).
    """
    ns = runpy.run_path(path)
    merged = copy.deepcopy(_DEFAULTS)
    explicit = set()
    sections = list(_SECTION_ORDER) + list(extra_sections or [])
    for section in sections:
        if section in ns and isinstance(ns[section], dict):
            merged.update(copy.deepcopy(ns[section]))
            explicit.update(ns[section].keys())
    merged.update(overrides)
    explicit.update(overrides)
    opt = Options(**merged)
    # keys the config file (or caller) actually set, vs. _DEFAULTS fallbacks
    # — lets CLIs distinguish "config says model_name=CRNN" from the default
    opt.explicit_keys = frozenset(explicit)
    return opt
