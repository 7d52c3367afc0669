"""Frozen experiment configurations.

TPU-native re-design of the reference NamedTuple configs
(reference: sim_config.py:4-60, global_config.py:3-8). Values are kept
identical so experiments reproduce the reference's hyperparameter regime.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

# Default compute dtype. The reference hardcodes torch.float32
# (global_config.py:3); float32 is also the right accumulation dtype for the
# tight dopri5 tolerances (rtol=1e-7) used throughout.
DTYPE = jnp.float32


@dataclasses.dataclass(frozen=True)
class RocheConfig:
    """13 PK/PD rate constants of the expert dexamethasone model.

    Reference: sim_config.py:4-18 (RochConfig).
    """

    HillCure: float = 2.0
    HillPatho: float = 2.0
    ec50_patho: float = 1.0
    emax_patho: float = 1.0
    k_dexa: float = 1.0
    k_discure_immunereact: float = 1.0
    k_discure_immunity: float = 1.0
    k_disprog: float = 1.0
    k_immune_disease: float = 1.0
    k_immune_feedback: float = 1.0
    k_immune_off: float = 1.0
    k_immunity: float = 1.0
    kel: float = 1.0

    def as_tuple(self):
        return dataclasses.astuple(self)

    def as_dict(self):
        return dataclasses.asdict(self)


# Canonical field order of the 13 expert parameters (matches RocheConfig).
ROCHE_PARAM_NAMES = tuple(f.name for f in dataclasses.fields(RocheConfig))


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Synthetic cohort configuration. Reference: sim_config.py:21-33."""

    n_sample: int = 1000
    obs_dim: int = 20
    latent_dim: int = 6
    action_dim: int = 1
    t_max: int = 14
    step_size: int = 1
    sparsity: float = 0.5
    output_sparsity: float = 0.5
    output_sigma: float = 0.1
    dose_max: float = 1.0
    p_remove: float = 0.5


# High-dimensional cohort presets. Reference: sim_config.py:36-38.
dim8_config = DataConfig(obs_dim=40, latent_dim=8, output_sparsity=1 - 0.375, output_sigma=0.2, dose_max=10)
dim12_config = DataConfig(obs_dim=80, latent_dim=12, output_sparsity=1 - 0.25, output_sigma=0.2, dose_max=10)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Reference: sim_config.py:41-45."""

    encoder_latent_ratio: float = 2.0
    expert_only: bool = False
    neural_ode: bool = False
    path: str = "model/"


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Reference: sim_config.py:48-56."""

    lr: float = 0.01
    ode_method: str = "dopri5"
    niters: int = 400
    batch_size: int = 50
    test_freq: int = 10
    shuffle: bool = True
    n_restart: int = 5
    early_stop: int = 10


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Reference: sim_config.py:59-60."""

    t0: int = 5


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Integrator configuration (replaces the reference's solver options dict,
    model.py:1074-1088 / model.py:822-829)."""

    method: str = "dopri5"
    rtol: float = 1e-7
    atol: float = 1e-8
    step_size: Optional[float] = None
    max_steps: int = 512
