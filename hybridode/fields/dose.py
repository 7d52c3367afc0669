"""Dose forcing kernels — pure, traced functions of `t`.

The reference mutates Python state on the ODE module (`set_action` caches
dose times/amounts, model.py:495-507) and closes over it inside the vector
field. Here the dose context is explicit data threaded through `args`, so the
whole solve stays a pure jittable function (SURVEY.md §7 design constraint).

Dose times are fixed-width `(B, max_doses)` arrays; absent doses carry a
large sentinel time so `t >= times` is never true (static shapes, no NaNs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NO_DOSE_TIME = 1e30


class DoseContext(NamedTuple):
    """Per-patient bolus doses: `times` (B, max_doses), `amounts` (B,)."""

    times: jnp.ndarray
    amounts: jnp.ndarray


def doses_from_actions(actions: jnp.ndarray, step_size: float = 1.0, max_doses: int = 1) -> DoseContext:
    """Extract the dose schedule from a (T, B, 1) action array.

    Reference semantics (model.py:495-507): dose times are the indices of
    nonzero actions scaled by step_size; the amount is the max action over
    time. Implemented with top_k instead of a per-sample Python loop.
    """
    a = actions[..., 0]  # (T, B)
    amounts = jnp.max(a, axis=0)
    indicator = (a != 0).astype(actions.dtype).T  # (B, T)
    vals, idx = jax.lax.top_k(indicator, max_doses)  # earliest nonzeros first
    times = idx.astype(actions.dtype) * step_size
    times = jnp.where(vals > 0, times, NO_DOSE_TIME)
    return DoseContext(times=times, amounts=amounts)


def exp_decay_dose(t, ctx: DoseContext, kel) -> jnp.ndarray:
    """Closed-form depot concentration: amount * sum_j exp(kel*(t_j - t)) 1[t>=t_j].

    Reference: model.py:509-513 (`dose_at_time`). Note the reference's sign
    convention: with kel > 0 and t >= t_j the exponent kel*(t_j - t) <= 0,
    i.e. first-order decay since administration.
    """
    active = t >= ctx.times  # (B, max_doses)
    delta = jnp.where(active, ctx.times - t, 0.0)
    contrib = jnp.where(active, jnp.exp(kel * delta), 0.0)
    return ctx.amounts * jnp.sum(contrib, axis=-1)


def impulse_dose(t, ctx: DoseContext) -> jnp.ndarray:
    """Impulse dose: amount iff the solver evaluates exactly at a dose time.

    Reference: model.py:1015-1017 (NeuralODE baseline). The exact float
    equality is deliberate parity — the NODE baseline only "sees" the dose
    when a stage evaluation lands on the dose time.
    """
    return ctx.amounts * jnp.sum((ctx.times == t).astype(ctx.amounts.dtype), axis=-1)


class CumDoseContext(NamedTuple):
    """Full action sequence for the real-data kernels: `actions` (T, B, A)."""

    actions: jnp.ndarray


def exp_decay_dose_seq(t, ctx: CumDoseContext, kel) -> jnp.ndarray:
    """Real-data depot kernel over the whole action sequence.

    Reference: model.py:647-657 (RocheODEReal.set_action_static /
    dose_at_time): administration times are 1..T (cumsum of ones) and every
    past action contributes amount * exp(kel*(t_j - t)).
    """
    T = ctx.actions.shape[0]
    times = jnp.arange(1, T + 1, dtype=ctx.actions.dtype)[:, None, None]  # (T,1,1)
    active = t >= times
    delta = jnp.where(active, times - t, 0.0)
    contrib = jnp.where(active, ctx.actions * jnp.exp(kel * delta), 0.0)
    return jnp.sum(contrib, axis=(0, 2))  # (B,)


def cumulative_dose(t, ctx: CumDoseContext) -> jnp.ndarray:
    """Cumulative administered dose up to floor(t); zero past the horizon.

    Reference: model.py:749-760 (NeuralODEReal.dose_at_time): indexes the
    time-axis cumsum of the action array at int(t).
    """
    cum = jnp.cumsum(ctx.actions, axis=0)  # (T, B, A)
    T = ctx.actions.shape[0]
    idx = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, T - 1)
    out = jax.lax.dynamic_index_in_dim(cum, idx, axis=0, keepdims=False)  # (B, A)
    return jnp.where(t >= T, jnp.zeros_like(out), out)
