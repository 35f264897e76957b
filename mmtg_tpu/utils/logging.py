"""Logging / timing / profiling utilities.

Keeps the reference's observability surface (CLI-selected log file with
step/val logs — ``train.py:58-63``, ``utils.py:13-20``) and adds what it
lacks (SURVEY.md §5): per-step wall-time, samples/sec and tokens/sec
counters, and optional ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional


def format_time(elapsed: float) -> str:
    """hh:mm:ss (reference ``utils.py:13-20``)."""
    elapsed_rounded = int(round(elapsed))
    h = elapsed_rounded // 3600
    m = (elapsed_rounded % 3600) // 60
    s = elapsed_rounded % 60
    return f"{h:02d}:{m:02d}:{s:02d}"


def setup_logger(log_path: Optional[str] = None, name: str = "mmtg_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)-2s - %(filename)-8s : "
        "%(lineno)s line - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    if log_path:
        import os

        parent = os.path.dirname(log_path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        fh = logging.FileHandler(log_path)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if not logger.handlers:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    return logger


class StepTimer:
    """Rolling throughput counter (samples/sec, tokens/sec, p50 step ms)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def p50_ms(self) -> float:
        if not self.times:
            return 0.0
        s = sorted(self.times)
        return 1000.0 * s[len(s) // 2]

    def throughput(self, units_per_step: int) -> float:
        if not self.times:
            return 0.0
        avg = sum(self.times) / len(self.times)
        return units_per_step / avg


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """``jax.profiler`` trace hook (Perfetto-compatible dump)."""
    if trace_dir:
        import jax

        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
