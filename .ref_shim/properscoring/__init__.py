"""properscoring stand-in: empirical-CDF CRPS for ensembles.

crps_ensemble(y, X) = mean_i |X_i - y| - 0.5 * mean_{i,j} |X_i - X_j|
(the estimator properscoring evaluates with uniform weights).
"""
import numpy as np


def crps_ensemble(observations, forecasts, axis=-1):
    forecasts = np.moveaxis(np.asarray(forecasts, dtype=float), axis, -1)
    obs = np.asarray(observations, dtype=float)[..., None]
    term1 = np.abs(forecasts - obs).mean(-1)
    spread = np.abs(forecasts[..., :, None] - forecasts[..., None, :]).mean((-1, -2))
    return term1 - 0.5 * spread
