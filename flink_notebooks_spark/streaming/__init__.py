"""Structured-Streaming surface: job monitoring + streaming runners."""

from .monitor import JobInfo, JobMonitor

__all__ = ["JobMonitor", "JobInfo"]
