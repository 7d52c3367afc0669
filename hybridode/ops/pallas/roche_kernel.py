"""Fused RK4 trajectory kernel for the hybrid Roche field (Pallas/TPU).

Integrates the expert-PK/PD ⊕ ml-remainder vector field (fields/roche.py,
reference RocheODE at model.py:515-555) over the full output grid inside ONE
kernel: the state never leaves VMEM between stages, substeps, or grid
points — where XLA's scan materializes the carry per step, this kernel only
writes the T grid states.

Layout is TPU-native: the state is transposed to (D_pad, B) so the batch
rides the 128-wide lanes and the D ≤ 8 state rows ride sublanes; the ml
matmul becomes W^T (ml, D) @ y (D, B) — an MXU matmul with the batch as the
wide N dimension. Doses are per-lane scalars (single-bolus schedule, the
simulation regime: dataloader.py:207-222 draws exactly one dose/patient).

Forward-only (eval / MC-sampling / data-generation paths — the reference's
mc_itr=50 posterior decodes at training_utils.py:144-151 are no-grad);
training uses the differentiable lax.scan solvers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ROCHE_PARAM_NAMES

D_PAD = 8  # sublane tile for f32
LANE = 128


def _pow(x, p):
    """|x| ** p via exp/log (Mosaic has no powf); exact 0 at x == 0."""
    return jnp.exp(p * jnp.log(jnp.maximum(x, 1e-30)))


def _field_tile(t, y, times, amounts, p, ml_w, ml_b, ml_dim):
    """dy/dt on a (D_PAD, TB) tile. p is a dict of scalar params."""
    Disease, ImmuneReact, Immunity, Dose2 = y[0], y[1], y[2], y[3]

    active = (t >= times).astype(y.dtype)
    delta = jnp.where(active > 0, times - t, 0.0)
    dose = amounts * jnp.exp(p["kel"] * delta) * active  # (TB,)

    d1 = (
        Disease * p["k_disprog"]
        - Disease * _pow(jnp.abs(Immunity), p["HillCure"]) * p["k_discure_immunity"]
        - Disease * ImmuneReact * p["k_discure_immunereact"]
    )
    irh = _pow(jnp.abs(ImmuneReact), p["HillPatho"])
    d2 = (
        Disease * p["k_immune_disease"]
        - ImmuneReact * p["k_immune_off"]
        + Disease * ImmuneReact * p["k_immune_feedback"]
        + (irh * p["emax_patho"]) / (_pow(jnp.abs(p["ec50_patho"]), p["HillPatho"]) + irh)
        - Dose2 * ImmuneReact * p["k_dexa"]
    )
    d3 = ImmuneReact * p["k_immunity"]
    d4 = p["kel"] * dose - p["kel"] * Dose2

    parts = [jnp.stack([d1, d2, d3, d4])]  # (4, TB)
    if ml_dim > 0:
        # (ml, D_PAD) @ (D_PAD, TB) on the MXU; padded rows of y are zero and
        # padded columns of ml_w are zero, so the product is exact.
        parts.append(jnp.tanh(
            jnp.dot(ml_w, y, preferred_element_type=jnp.float32) + ml_b[:, None]
        ))
    # Mosaic rejects zero-sized vectors, so only pad when rows remain
    # (ml_dim == D_PAD - 4 needs no pad block at all).
    pad_rows = D_PAD - 4 - ml_dim
    if pad_rows > 0:
        parts.append(jnp.zeros((pad_rows, y.shape[1]), y.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _kernel(scalars_ref, ts_ref, y_ref, times_ref, amounts_ref, mlw_ref, mlb_ref, out_ref,
            *, n_out, n_sub, ml_dim):
    p = {name: scalars_ref[i] for i, name in enumerate(ROCHE_PARAM_NAMES)}
    times = times_ref[0, :]
    amounts = amounts_ref[0, :]
    ml_w = mlw_ref[:, :]  # (D_PAD rows used: ml_dim, D_PAD)
    ml_b = mlb_ref[0, :ml_dim] if ml_dim > 0 else None

    def field(t, y):
        return _field_tile(t, y, times, amounts, p, ml_w[:ml_dim] if ml_dim > 0 else None, ml_b, ml_dim)

    y = y_ref[:, :]
    out_ref[0, :, :] = y

    def interval(i, y):
        t_lo = ts_ref[i]
        t_hi = ts_ref[i + 1]
        dt = (t_hi - t_lo) / n_sub

        def substep(s, y):
            t = t_lo + dt * s
            k1 = field(t, y)
            k2 = field(t + 0.5 * dt, y + 0.5 * dt * k1)
            k3 = field(t + 0.5 * dt, y + 0.5 * dt * k2)
            k4 = field(t + dt, y + dt * k3)
            return y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

        y = jax.lax.fori_loop(0, n_sub, substep, y)
        out_ref[i + 1, :, :] = y
        return y

    jax.lax.fori_loop(0, n_out - 1, interval, y)


def roche_rk4_trajectory(y0, times, amounts, expert_params, ml_w, ml_b, ts,
                         n_substeps: int = 1, *, interpret: bool = False):
    """Integrate the hybrid Roche field with fused RK4 on TPU.

    Args:
      y0: (B, D) initial latents, D <= 8 (4 expert + ml remainder).
      times: (B,) single-bolus dose times (sentinel > t_final for no dose).
      amounts: (B,) dose amounts.
      expert_params: dict of the 13 scalar rate constants.
      ml_w: (D, ml_dim) remainder weights or None.
      ml_b: (ml_dim,) remainder bias or None.
      ts: (T,) output grid.
      n_substeps: RK4 substeps per grid interval.

    Returns (T, B, D).
    """
    B, D = y0.shape
    ml_dim = 0 if ml_w is None else ml_w.shape[1]
    assert D <= D_PAD and D == 4 + ml_dim
    T = len(ts)

    B_pad = int(np.ceil(B / LANE) * LANE)
    yt = jnp.zeros((D_PAD, B_pad), jnp.float32).at[:D, :B].set(y0.T)
    times_p = jnp.full((1, B_pad), 1e30, jnp.float32).at[0, :B].set(times)
    amounts_p = jnp.zeros((1, B_pad), jnp.float32).at[0, :B].set(amounts)

    scalars = jnp.stack([jnp.asarray(expert_params[n], jnp.float32) for n in ROCHE_PARAM_NAMES])
    if ml_dim > 0:
        mlw = jnp.zeros((D_PAD, D_PAD), jnp.float32).at[:ml_dim, :D].set(ml_w.T)
        mlb = jnp.zeros((1, D_PAD), jnp.float32).at[0, :ml_dim].set(ml_b)
    else:
        mlw = jnp.zeros((D_PAD, D_PAD), jnp.float32)
        mlb = jnp.zeros((1, D_PAD), jnp.float32)

    grid = (B_pad // LANE,)
    kernel = functools.partial(_kernel, n_out=T, n_sub=n_substeps, ml_dim=ml_dim)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # scalars (13,), ts (T,)
            grid=grid,
            # index maps receive the scalar-prefetch refs as trailing args
            in_specs=[
                pl.BlockSpec((D_PAD, LANE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((D_PAD, D_PAD), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D_PAD), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, D_PAD, LANE), lambda i, *_: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((T, D_PAD, B_pad), jnp.float32),
        interpret=interpret,
    )(scalars, jnp.asarray(ts, jnp.float32), yt, times_p, amounts_p, mlw, mlb)

    return jnp.transpose(out[:, :D, :B], (0, 2, 1))  # (T, B, D)


def roche_rk4_trajectory_from_pytree(params, ctx, ts, n_substeps=1, *, interpret=False):
    """Adapter from the fields/roche.py params pytree + DoseContext."""
    ml = params.get("ml_net")
    ml_w = ml[0]["w"] if ml else None
    ml_b = ml[0]["b"] if ml else None
    return lambda y0: roche_rk4_trajectory(
        y0, ctx.times[:, 0], ctx.amounts, params["expert"], ml_w, ml_b, ts,
        n_substeps, interpret=interpret,
    )
