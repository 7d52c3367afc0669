"""Black-box neural ODE vector field (simulation baseline).

Reference: model.py:969-1026 (NeuralODE): an MLP
(latent+1) -> 10*latent -> latent with tanh on both layers; the dose enters
as an impulse concatenated to the state (model.py:1015-1026).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DTYPE
from ..models import nn
from . import dose as dose_lib


def init_neural_field(key, latent_dim: int, dtype=DTYPE):
    return {"ml_net": nn.mlp_init(key, [latent_dim + 1, latent_dim * 10, latent_dim], dtype=dtype)}


def neural_field(t, y, args):
    """dy/dt = MLP([y, impulse_dose(t)]). y: (B, D)."""
    params, ctx = args
    dose = dose_lib.impulse_dose(t, ctx)  # (B,)
    y_full = jnp.concatenate([y, dose[..., None]], axis=-1)
    return nn.mlp_apply(params["ml_net"], y_full, final_activation=jnp.tanh)
