"""Metric writers: terminal printer with ETA, metrics.json lines, optional
tensorboard.

Parity target: core/utils/my_writer.py (MyCommonMetricPrinter with
ETA-to-eval/ckpt :112-256, MyJSONWriter :258-324, MyTensorboardXWriter) on
top of a simple EventStorage-like scalar buffer.
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict, deque

logger = logging.getLogger("self6dpp_tpu")


class EventStorage:
    """Rolling scalar store (median smoothing like d2's HistoryBuffer)."""

    def __init__(self, window: int = 20):
        self.window = window
        self._hist: dict[str, deque] = defaultdict(lambda: deque(maxlen=window))
        self._latest: dict[str, float] = {}
        self.iter = 0

    def put_scalars(self, **kw) -> None:
        for k, v in kw.items():
            v = float(v)
            self._hist[k].append(v)
            self._latest[k] = v

    def median(self, key: str) -> float:
        h = sorted(self._hist[key])
        return h[len(h) // 2] if h else 0.0

    def latest(self) -> dict[str, float]:
        return dict(self._latest)


class TerminalWriter:
    def __init__(self, storage: EventStorage, max_iter: int,
                 log_period: int = 100):
        self.storage = storage
        self.max_iter = max_iter
        self.log_period = log_period
        self._t0 = time.perf_counter()
        self._last_iter = 0

    def write(self) -> None:
        it = self.storage.iter
        if it % self.log_period != 0:
            return
        elapsed = time.perf_counter() - self._t0
        done = max(it - self._last_iter, 1)
        per_iter = elapsed / done
        eta = per_iter * (self.max_iter - it)
        self._t0 = time.perf_counter()
        self._last_iter = it
        scalars = " ".join(
            f"{k}: {self.storage.median(k):.4f}"
            for k in sorted(self.storage.latest())
            if k.startswith(("loss", "total")))
        logger.info(
            f"iter {it}/{self.max_iter} eta {eta / 60:.1f}min "
            f"({per_iter:.3f}s/it) {scalars}")


class JSONWriter:
    """Appends one json line per period to metrics.json."""

    def __init__(self, storage: EventStorage, path: str,
                 log_period: int = 100):
        self.storage = storage
        self.path = path
        self.log_period = log_period
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def write(self) -> None:
        if self.storage.iter % self.log_period != 0:
            return
        row = {"iteration": self.storage.iter, **self.storage.latest()}
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")


def setup_logger(output_dir: str | None = None,
                 level: int = logging.INFO) -> logging.Logger:
    """Unified logger (reference lib/utils/setup_logger.py role)."""
    lg = logging.getLogger("self6dpp_tpu")
    if lg.handlers:
        return lg
    lg.setLevel(level)
    fmt = logging.Formatter("[%(asctime)s %(levelname).1s] %(message)s",
                            datefmt="%m%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    lg.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "log.txt"))
        fh.setFormatter(fmt)
        lg.addHandler(fh)
    return lg
