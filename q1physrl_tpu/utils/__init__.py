"""Utility subsystems: demo-file protocol, profiling."""

from . import demfile

__all__ = ("demfile",)
