"""Utilities: configuration, tracing/metrics."""

from .config import DecodeConfig
from .trace import StageTimer, Trace

__all__ = ["DecodeConfig", "Trace", "StageTimer"]
