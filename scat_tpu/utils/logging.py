"""Structured metrics logging.

The reference logs by print-redirect into ``debug_logs/*.log``
(reference README.md:28) with a tensorboard writer left as a comment
(train.py:233).  This emits the same quantities (total/3d/2d/pl loss
decomposition, eval MPJPE/AUC/PCK) as append-only CSV plus the original
stdout format, so both humans and tooling can consume runs.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None,
                 filename: str = "metrics.csv"):
        self.log_dir = log_dir
        self._writer = None
        self._file = None
        self._fields = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._path = os.path.join(log_dir, filename)

    def log(self, step: int, metrics: Dict[str, float]):
        if self.log_dir is None:
            return
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        if self._writer is None:
            self._fields = list(row.keys())
            exists = os.path.exists(self._path)
            self._file = open(self._path, "a", newline="")
            self._writer = csv.DictWriter(self._file,
                                          fieldnames=self._fields)
            if not exists:
                self._writer.writeheader()
        self._writer.writerow({k: row.get(k, "") for k in self._fields})
        self._file.flush()

    def close(self):
        if self._file:
            self._file.close()
            self._file = None
            self._writer = None
