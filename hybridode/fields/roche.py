"""Expert + hybrid PK/PD vector field for the simulation track.

TPU-native re-design of the reference `RocheODE` (model.py:446-555): a pure
function of (t, y, args) where args = (params, DoseContext). The 13 expert
rate constants live in the params pytree (trainable or frozen via optimizer
masking — reference freezes them in sim, run_simulation.py:125-131); the
hybrid "ml remainder" is a Linear+Tanh net driven by the full state
(model.py:487-490, 551-553).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DTYPE, ROCHE_PARAM_NAMES, RocheConfig
from ..models import nn
from . import dose as dose_lib


def init_roche_field(key, latent_dim: int, roche_config: RocheConfig | None = None, ablate: bool = False, dtype=DTYPE):
    """Build the params pytree. latent_dim >= 4; dims beyond 4 are the ml remainder."""
    if roche_config is None:
        roche_config = RocheConfig()
    expert = {name: jnp.asarray(getattr(roche_config, name), dtype) for name in ROCHE_PARAM_NAMES}
    params = {"expert": expert}
    ml_dim = latent_dim - 4
    if ml_dim > 0:
        params["ml_net"] = nn.mlp_init(key, [latent_dim, ml_dim], dtype=dtype)
    if ablate:
        # Deliberately-wrong linear expert for the ablation study
        # (model.py:483-485, 545-549).
        params["theta_1"] = jnp.asarray(1.0, dtype)
        params["theta_2"] = jnp.asarray(2.0, dtype)
    return params


def _abs_pow(x, p):
    """|x|**p — the Hill terms. States are nonnegative in-model; trial solver
    steps may transiently dip below zero, where torch's pow(neg, 2.0) is the
    even-power value. abs-power matches that for the (frozen) even Hill
    exponents while never producing NaN."""
    return jnp.power(jnp.abs(x), p)


def roche_field(t, y, args):
    """dy/dt for the expert/hybrid Roche model. y: (B, D), D = 4 + ml_dim.

    Expert dynamics follow model.py:527-544; ml remainder model.py:551-553.
    """
    params, ctx = args
    e = params["expert"]

    Disease = y[..., 0]
    ImmuneReact = y[..., 1]
    Immunity = y[..., 2]
    Dose2 = y[..., 3]

    if "theta_1" in params:  # ablation: wrong linear expert
        dxdt1 = ImmuneReact
        dxdt2 = -1.0 * Disease * params["theta_1"]
        dxdt3 = Dose2
        dxdt4 = -1.0 * Immunity * params["theta_2"]
    else:
        Dose = dose_lib.exp_decay_dose(t, ctx, e["kel"])

        dxdt1 = (
            Disease * e["k_disprog"]
            - Disease * _abs_pow(Immunity, e["HillCure"]) * e["k_discure_immunity"]
            - Disease * ImmuneReact * e["k_discure_immunereact"]
        )

        ir_hill = _abs_pow(ImmuneReact, e["HillPatho"])
        dxdt2 = (
            Disease * e["k_immune_disease"]
            - ImmuneReact * e["k_immune_off"]
            + Disease * ImmuneReact * e["k_immune_feedback"]
            + (ir_hill * e["emax_patho"]) / (_abs_pow(e["ec50_patho"], e["HillPatho"]) + ir_hill)
            - Dose2 * ImmuneReact * e["k_dexa"]
        )

        dxdt3 = ImmuneReact * e["k_immunity"]
        dxdt4 = e["kel"] * Dose - e["kel"] * Dose2

    expert_dxdt = jnp.stack([dxdt1, dxdt2, dxdt3, dxdt4], axis=-1)

    if "ml_net" in params:
        dmldt = nn.mlp_apply(params["ml_net"], y, final_activation=jnp.tanh)
        return jnp.concatenate([expert_dxdt, dmldt], axis=-1)
    return expert_dxdt


def expert_param_vector(params):
    """The 13 rate constants in canonical order (for logging/inspection)."""
    return jnp.stack([params["expert"][n] for n in ROCHE_PARAM_NAMES])
