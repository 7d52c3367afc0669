"""Metrics and evaluation loops."""

from .metrics import (
    bootstrap_rmse,
    crps_ensemble,
    evaluate,
    evaluate_ensemble,
    evaluate_ensemble_horizon,
    evaluate_horizon,
)

__all__ = [
    "crps_ensemble",
    "bootstrap_rmse",
    "evaluate",
    "evaluate_horizon",
    "evaluate_ensemble",
    "evaluate_ensemble_horizon",
]
