"""Logging, timing, and IO utilities."""

from tgtc.utils.logging import MetricsLogger, SegmentTimer

__all__ = ["MetricsLogger", "SegmentTimer"]
