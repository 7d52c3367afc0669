"""Trial-step budget calibration for the bounded adaptive integrator.

`odeint_dopri5` pays for its whole `max_steps` budget only until the
integration finishes (chunked early exit), but unfinished lanes burn the full
budget and the recorded-step buffers of the adjoint scale with it — so a
budget calibrated to the cohort's actual demand (instead of a generous
hand-set constant) is the cheap ~1.5x on the epoch metric listed in
PERFORMANCE.md. The reference has no analog: torchdiffeq iterates until
convergence with unbounded Python control flow, which XLA cannot compile.

Calibration = probe the per-sample trial-step demand once on a
representative batch at a generous budget, then round margin * max-demand up
to the solver's chunk size.

A later batch whose demand exceeds margin * probe-max is NOT silent during
training: unfinished lanes leave NaN in the solution (dopri5 budget
exhaustion), the loss goes non-finite, and the training loop's finite-loss
gate stops the restart (inference/train.py). Standalone callers should check
`stats.success` themselves.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from .dopri5 import _CHUNK_SIZE, odeint_dopri5


def calibrate_trial_budget(
    field,
    y0_batch: jnp.ndarray,
    ts: jnp.ndarray,
    args_batch: Any = None,
    *,
    rtol: float = 1e-7,
    atol: float = 1e-8,
    margin: float = 1.25,
    probe_budget: int = 1024,
    per_sample: bool = True,
) -> int:
    """Measured trial-step budget for a batched solve, rounded to chunks.

    `y0_batch` is (B, D); `args_batch` is vmapped over axis 0 when
    `per_sample` (the decoder's per-sample step-control layout,
    decoders.sim_decoder_apply), otherwise passed whole to one batched solve.
    Returns ceil(margin * max per-sample trial steps / chunk) * chunk.
    Raises if any probe lane exhausted even the probe budget.
    """

    if per_sample:
        def solve_one(y0, args):
            _, stats = odeint_dopri5(
                field, y0, ts, args, rtol=rtol, atol=atol, max_steps=probe_budget)
            return stats.n_steps, stats.success

        n_steps, ok = jax.vmap(solve_one)(y0_batch, args_batch)
    else:
        _, stats = odeint_dopri5(
            field, y0_batch, ts, args_batch, rtol=rtol, atol=atol, max_steps=probe_budget)
        n_steps, ok = stats.n_steps[None], stats.success[None]

    n_steps = jax.device_get(n_steps)
    if not bool(jnp.all(ok)):
        raise RuntimeError(
            f"calibration probe exhausted its own budget ({probe_budget}); "
            "raise probe_budget or loosen tolerances")
    demand = int(n_steps.max())
    budget = max(1, math.ceil(margin * demand / _CHUNK_SIZE)) * _CHUNK_SIZE
    return budget
