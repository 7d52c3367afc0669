"""Real-data (ICU cohort) vector fields.

Reference classes re-designed as pure functions:
* `roche_real_field`    <- RocheODEReal    (model.py:570-657): learned
  dDisease/dImmuneReact nets over expert sub-states, closed-form
  immunity/depot dynamics with learnable k's, continuous-time GRU remainder.
* `neural_real_field`   <- NeuralODEReal   (model.py:717-769)
* `neural_real_2nd_field` <- NeuralODEReal2nd (model.py:660-714)

args = (params, CumDoseContext) — the full (T, B, A) action sequence rides in
the context instead of being mutated onto the module (set_action_static).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DTYPE
from ..models import nn
from . import dose as dose_lib

EXPERT_DIM = 4


def init_roche_real_field(key, latent_dim: int, hidden_dim: int, dtype=DTYPE):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    ml_dim = latent_dim - EXPERT_DIM
    params = {
        "dx1_net": nn.mlp_init(k1, [3, hidden_dim, 1], dtype=dtype),
        "dx2_net": nn.mlp_init(k2, [2, hidden_dim, 1], dtype=dtype),
        "k_immunity": jnp.asarray(1.0, dtype),
        "kel": jnp.asarray(0.2, dtype),
        "kel2": jnp.asarray(0.2, dtype),
    }
    if ml_dim > 0:
        params["lin_hr"] = nn.linear_init(k3, ml_dim, ml_dim, bias=False, dtype=dtype)
        params["lin_hz"] = nn.linear_init(k4, ml_dim, ml_dim, bias=False, dtype=dtype)
        params["lin_hh"] = nn.linear_init(k5, ml_dim, ml_dim, bias=False, dtype=dtype)
    return params


def roche_real_field(t, y, args):
    p, ctx = args
    ImmuneReact = y[..., 1]
    Dose2 = y[..., 3]
    Dose = dose_lib.exp_decay_dose_seq(t, ctx, p["kel"])

    # Learned expert-structure dynamics with tanh saturation (model.py:588-590).
    dxdt1 = nn.mlp_apply(p["dx1_net"], y[..., :3], final_activation=jnp.tanh)
    dxdt2 = nn.mlp_apply(p["dx2_net"], y[..., :2], final_activation=jnp.tanh)
    dxdt3 = (ImmuneReact * p["k_immunity"])[..., None]
    dxdt4 = (p["kel"] * Dose - p["kel2"] * Dose2)[..., None]

    expert = jnp.concatenate([dxdt1, dxdt2, dxdt3, dxdt4], axis=-1)
    if "lin_hr" not in p:
        return expert

    # Continuous-time GRU remainder (model.py:636-645).
    h = y[..., EXPERT_DIM:]
    r = jax.nn.sigmoid(nn.linear_apply(p["lin_hr"], h))
    z = jax.nn.sigmoid(nn.linear_apply(p["lin_hz"], h))
    u = jnp.tanh(nn.linear_apply(p["lin_hh"], r * h))
    dmldt = (1 - z) * (u - h)
    return jnp.concatenate([expert, dmldt], axis=-1)


def init_neural_real_field(key, latent_dim: int, action_dim: int, hidden_dim: int, dtype=DTYPE):
    return {"ml_net": nn.mlp_init(key, [latent_dim + action_dim, hidden_dim, latent_dim], dtype=dtype)}


def neural_real_field(t, y, args):
    p, ctx = args
    dose = dose_lib.cumulative_dose(t, ctx)  # (B, A)
    y_full = jnp.concatenate([y, dose], axis=-1)
    return nn.mlp_apply(p["ml_net"], y_full, final_activation=jnp.tanh)


def init_neural_real_2nd_field(key, latent_dim: int, action_dim: int, hidden_dim: int, dtype=DTYPE):
    return {"ml_net": nn.mlp_init(key, [latent_dim + action_dim, hidden_dim, latent_dim // 2], dtype=dtype)}


def neural_real_2nd_field(t, y, args):
    """Second-order latent dynamics: velocity half gets the MLP, position half
    integrates the velocity (model.py:705-714)."""
    p, ctx = args
    latent_dim = y.shape[-1]
    dose = dose_lib.cumulative_dose(t, ctx)
    y_full = jnp.concatenate([y, dose], axis=-1)
    dml1dt = nn.mlp_apply(p["ml_net"], y_full, final_activation=jnp.tanh)
    dml2dt = y[..., : latent_dim // 2]
    return jnp.concatenate([dml1dt, dml2dt], axis=-1)
