"""Observability: structured logging, phase timers, profiling hooks."""

from .logging import CSVCurveLogger, JSONLLogger
from .profiling import PhaseTimer, trace_to

__all__ = ["JSONLLogger", "CSVCurveLogger", "PhaseTimer", "trace_to"]
