"""Pallas TPU kernels."""

from .roche_kernel import roche_rk4_trajectory, roche_rk4_trajectory_from_pytree

__all__ = ["roche_rk4_trajectory", "roche_rk4_trajectory_from_pytree"]
