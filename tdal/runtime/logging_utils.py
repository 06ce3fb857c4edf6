"""Logging, metric buffering, seeding, and timing.

Capability parity with the reference's observability layer (SURVEY.md §5.1/§5.5):
- ``create_logger``       ~ tools/utils.py:31-44 (file + console)
- ``LogBuffer``           ~ det3d/torchie/trainer/log_buffer.py:6-40 (windowed averages)
- ``fix_seed``            ~ tools/utils.py:24-29 (seed 10922081 determinism pinning;
                            JAX is deterministic by construction — we seed numpy/random
                            for the host-side data pipeline and return a jax PRNG key)
- ``Timer``               ~ torchie/utils/timer.py:10-90
"""

from __future__ import annotations

import logging
import random
import sys
import time
from collections import OrderedDict
from pathlib import Path

import jax
import numpy as np

DEFAULT_SEED = 10922081  # reference tools/utils.py:24


def create_logger(log_file=None, name: str = "tdal", level=logging.INFO):
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    fmt = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_file is not None:
        log_file = Path(log_file)
        log_file.parent.mkdir(parents=True, exist_ok=True)
        if not any(
            isinstance(h, logging.FileHandler)
            and getattr(h, "baseFilename", None) == str(log_file)
            for h in logger.handlers
        ):
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


def fix_seed(seed: int = DEFAULT_SEED) -> jax.Array:
    """Pin host-side RNGs and return the root jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class LogBuffer:
    """Windowed scalar averaging. Parity: torchie/trainer/log_buffer.py:6-40."""

    def __init__(self):
        self.val_history = OrderedDict()
        self.n_history = OrderedDict()
        self.output = OrderedDict()
        self.ready = False

    def clear(self):
        self.val_history.clear()
        self.n_history.clear()
        self.clear_output()

    def clear_output(self):
        self.output.clear()
        self.ready = False

    def update(self, vars: dict, count: int = 1):
        for k, v in vars.items():
            self.val_history.setdefault(k, []).append(float(v))
            self.n_history.setdefault(k, []).append(count)

    def average(self, n: int = 0):
        """Average the latest n values, or all if n == 0."""
        for k in self.val_history:
            v = np.array(self.val_history[k][-n or None :] if n else self.val_history[k])
            c = np.array(self.n_history[k][-n or None :] if n else self.n_history[k])
            self.output[k] = float((v * c).sum() / c.sum())
        self.ready = True


class Timer:
    """Context-manager + running timer. Parity: torchie/utils/timer.py:10-90."""

    def __init__(self, start: bool = True):
        self._is_running = False
        if start:
            self.start()

    @property
    def is_running(self):
        return self._is_running

    def start(self):
        if not self._is_running:
            self._t_start = time.time()
            self._is_running = True
        self._t_last = time.time()

    def since_start(self) -> float:
        self._t_last = time.time()
        return self._t_last - self._t_start

    def since_last_check(self) -> float:
        dur = time.time() - self._t_last
        self._t_last = time.time()
        return dur

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *args):
        print(f"{self.since_last_check():.3f}")
        self._is_running = False


class ProgressCounter:
    """Minimal text progress reporting (tqdm-free; torchie/utils/progressbar.py parity)."""

    def __init__(self, total: int, logger=None, every: int = 50, prefix: str = ""):
        self.total = total
        self.count = 0
        self.every = every
        self.logger = logger
        self.prefix = prefix
        self.timer = Timer()

    def update(self, n: int = 1):
        self.count += n
        if self.logger is not None and (
            self.count % self.every == 0 or self.count == self.total
        ):
            elapsed = self.timer.since_start()
            rate = self.count / max(elapsed, 1e-9)
            eta = (self.total - self.count) / max(rate, 1e-9)
            self.logger.info(
                f"{self.prefix}{self.count}/{self.total} "
                f"({rate:.1f}/s, eta {eta:.0f}s)"
            )


class MetricsWriter:
    """JSONL metrics log + optional TensorBoard.

    Parity: TextLoggerHook's json dump (hooks/logger/text.py:111-133) and
    TensorboardLoggerHook (hooks/logger/tensorboard.py:9-55, gated on the optional
    tensorboardX/tensorflow packages)."""

    def __init__(self, log_dir, tensorboard: bool = False):
        import json as _json
        from pathlib import Path as _Path

        self._json = _json
        self.path = _Path(log_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(str(_Path(log_dir) / "tf_logs"))
            except ImportError:
                pass

    def write(self, step: int, metrics: dict, mode: str = "train"):
        row = {"mode": mode, "step": int(step)}
        row.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(self._json.dumps(row) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{mode}/{k}", float(v), int(step))

    def close(self):
        if self._tb is not None:
            self._tb.close()
