"""Structured metrics logging.

The reference logs by print-redirect into ``debug_logs/*.log``
(reference README.md:28) with a tensorboard writer left as a comment
(train.py:233).  This emits the same quantities (total/3d/2d/pl loss
decomposition, eval MPJPE/AUC/PCK) as append-only CSV plus the original
stdout format, so both humans and tooling can consume runs; pass
``tensorboard=True`` (``--tensorboard True``) to additionally write TB
event files — the writer the reference commented out, made real.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None,
                 filename: str = "metrics.csv",
                 tensorboard: bool = False):
        self.log_dir = log_dir
        self._writer = None
        self._file = None
        self._fields = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._path = os.path.join(log_dir, filename)
            if tensorboard:
                try:
                    from tensorboardX import SummaryWriter
                except ImportError:
                    # the CSV stays authoritative; TB is an optional
                    # mirror (the reference pins tensorboardX in
                    # requirements.txt:105 but never imports it)
                    print("[logging] --tensorboard requested but "
                          "tensorboardX is not installed; CSV only")
                else:
                    stem = os.path.splitext(filename)[0]
                    self._tb = SummaryWriter(
                        logdir=os.path.join(log_dir, "tb", stem))

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
        if self._tb is not None:
            for k, v in metrics.items():
                v = float(v)
                if v == v:  # TB rejects NaN points silently-uglily
                    self._tb.add_scalar(k, v, global_step=step)

    def close(self):
        if self._file:
            self._file.close()
            self._file = None
            self._writer = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
