"""Structured-Streaming surface: job monitoring + streaming runners."""

from .monitor import JobInfo, JobMonitor
from .runner import SinkSpec, drain, start_sink

__all__ = ["JobMonitor", "JobInfo", "SinkSpec", "start_sink", "drain"]
