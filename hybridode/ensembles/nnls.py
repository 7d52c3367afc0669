"""Non-negative least squares — native implementation.

Replaces scipy.optimize.nnls (Fortran Lawson-Hanson) used by the ensemble
pipelines (run_simulation_ensemble.py:135, run_real_ensemble.py:114). The
reference only ever solves 2-variable problems (expert weight, ml weight) —
that case has an exact closed form, vectorized here across all time steps at
once instead of one Fortran call per time index
(run_simulation_ensemble.py:130-138).

A general dense active-set solver is provided for completeness.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def nnls2(a1, a2, b):
    """Exact 2-variable NNLS, batched over leading axes.

    Solves min_w>=0 ||w1*a1 + w2*a2 - b||^2 where a1, a2, b have shape
    (..., n). Returns (w1, w2) of shape (...). Strategy: the unconstrained
    2x2 normal-equation solution if feasible, else the best single-variable
    projection — exhaustive over the 2-var active sets, hence exact.
    """
    a11 = jnp.sum(a1 * a1, axis=-1)
    a22 = jnp.sum(a2 * a2, axis=-1)
    a12 = jnp.sum(a1 * a2, axis=-1)
    b1 = jnp.sum(a1 * b, axis=-1)
    b2 = jnp.sum(a2 * b, axis=-1)

    det = a11 * a22 - a12 * a12
    safe_det = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    w1_u = (a22 * b1 - a12 * b2) / safe_det
    w2_u = (a11 * b2 - a12 * b1) / safe_det
    feasible = (w1_u >= 0) & (w2_u >= 0) & (jnp.abs(det) >= 1e-30)

    # Single-variable candidates.
    w1_s = jnp.maximum(b1 / jnp.where(a11 < 1e-30, 1.0, a11), 0.0) * (a11 >= 1e-30)
    w2_s = jnp.maximum(b2 / jnp.where(a22 < 1e-30, 1.0, a22), 0.0) * (a22 >= 1e-30)

    # Residual^2 up to the constant ||b||^2: r(w) = w'Qw - 2 w'c.
    def obj(w1, w2):
        return w1 * w1 * a11 + w2 * w2 * a22 + 2 * w1 * w2 * a12 - 2 * (w1 * b1 + w2 * b2)

    use_w1 = obj(w1_s, jnp.zeros_like(w1_s)) <= obj(jnp.zeros_like(w2_s), w2_s)
    w1_best = jnp.where(use_w1, w1_s, 0.0)
    w2_best = jnp.where(use_w1, 0.0, w2_s)

    w1 = jnp.where(feasible, w1_u, w1_best)
    w2 = jnp.where(feasible, w2_u, w2_best)
    return w1, w2


def nnls(A: np.ndarray, b: np.ndarray, max_iter: int | None = None):
    """Dense Lawson–Hanson active-set NNLS (host-side, NumPy).

    Same contract as scipy.optimize.nnls: returns (x, rnorm).
    """
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)
    m, n = A.shape
    if max_iter is None:
        max_iter = 3 * n

    x = np.zeros(n)
    passive: set[int] = set()
    w = A.T @ (b - A @ x)
    tol = 1e-12 * np.linalg.norm(A, 1) * max(m, 1)

    it = 0
    while len(passive) < n and np.max(np.where([i not in passive for i in range(n)], w, -np.inf)) > tol:
        j = int(np.argmax(np.where([i not in passive for i in range(n)], w, -np.inf)))
        passive.add(j)
        while True:
            it += 1
            if it > max_iter:
                break
            P = sorted(passive)
            s = np.zeros(n)
            s[P] = np.linalg.lstsq(A[:, P], b, rcond=None)[0]
            if np.all(s[P] > tol):
                x = s
                break
            neg = [i for i in P if s[i] <= tol]
            alpha = min(x[i] / (x[i] - s[i]) for i in neg if x[i] != s[i])
            x = x + alpha * (s - x)
            passive = {i for i in P if x[i] > tol}
            if not passive:
                x = np.zeros(n)
                break
        if it > max_iter:
            break
        w = A.T @ (b - A @ x)

    return x, float(np.linalg.norm(A @ x - b))


def learn_ensemble_weights(x, x_hat_e, x_hat_m, t0: int):
    """Per-time-step NNLS ensemble weights (run_simulation_ensemble.py:130-138).

    x, x_hat_e, x_hat_m: (T, B, D). For each t >= t0, solves the 2-var NNLS
    over the flattened (B*D) residuals — one vectorized closed-form solve for
    all time steps at once. Returns (weights_e, weights_m), each (T, 1, D).
    """
    T, B, D = x.shape
    xf = jnp.reshape(x, (T, B * D))
    ef = jnp.reshape(x_hat_e[:T], (T, B * D))
    mf = jnp.reshape(x_hat_m[:T], (T, B * D))
    w1, w2 = nnls2(ef, mf, xf)  # (T,)
    keep = (jnp.arange(T) >= t0).astype(x.dtype)
    w1 = w1 * keep
    w2 = w2 * keep
    weights_e = jnp.broadcast_to(w1[:, None, None], (T, 1, D))
    weights_m = jnp.broadcast_to(w2[:, None, None], (T, 1, D))
    return weights_e, weights_m
