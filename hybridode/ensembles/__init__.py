"""Ensemble / residual hybrid pipelines."""

from .nnls import learn_ensemble_weights, nnls, nnls2

__all__ = ["nnls", "nnls2", "learn_ensemble_weights"]
