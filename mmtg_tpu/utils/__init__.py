"""Shared utilities: timing, logging, profiling hooks."""

from mmtg_tpu.utils.logging import format_time, setup_logger, StepTimer  # noqa: F401
