"""Pallas TPU kernels for the hot paths."""

from . import env_rollout_pallas

__all__ = ("env_rollout_pallas",)
