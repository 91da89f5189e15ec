"""Plain-text experiment logging, format-compatible with the reference
(per-experiment ``log_train.txt`` + global append-only ``data_any.txt``;
reference: il_modules/base.py:461-467, tiny_train.py:27-34)."""

from __future__ import annotations

import os
import sys
import time


class ExperimentLog:
    def __init__(self, exp_name: str, output_dir: str = "./saved_models",
                 data_log: str = "./data_any.txt", echo: bool = True):
        self.exp_name = exp_name
        self.exp_dir = os.path.join(output_dir, exp_name)
        os.makedirs(self.exp_dir, exist_ok=True)
        self.train_log_path = os.path.join(self.exp_dir, "log_train.txt")
        self.data_log_path = data_log
        self.echo = echo

    def write(self, line: str):
        with open(self.train_log_path, "a", encoding="utf-8") as f:
            f.write(line)
        if self.echo:
            sys.stdout.write(line)
            sys.stdout.flush()

    def write_data_log(self, line: str):
        with open(self.data_log_path, "a+", encoding="utf-8") as f:
            f.write(line)


class StepTimer:
    """Wall-clock step timing (replaces the reference's ad-hoc time.time()
    bookkeeping; also feeds bench.py)."""

    def __init__(self):
        self.start = time.time()
        self.laps = []

    def lap(self) -> float:
        now = time.time()
        dt = now - self.start
        self.laps.append(dt)
        self.start = now
        return dt
