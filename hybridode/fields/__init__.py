"""ODE vector fields as pure functions (t, y, args) -> dy/dt."""

from .dose import (
    CumDoseContext,
    DoseContext,
    cumulative_dose,
    doses_from_actions,
    exp_decay_dose,
    exp_decay_dose_seq,
    impulse_dose,
)
from .neural import init_neural_field, neural_field
from .real import (
    EXPERT_DIM,
    init_neural_real_2nd_field,
    init_neural_real_field,
    init_roche_real_field,
    neural_real_2nd_field,
    neural_real_field,
    roche_real_field,
)
from .roche import expert_param_vector, init_roche_field, roche_field

__all__ = [
    "DoseContext",
    "CumDoseContext",
    "doses_from_actions",
    "exp_decay_dose",
    "impulse_dose",
    "exp_decay_dose_seq",
    "cumulative_dose",
    "roche_field",
    "init_roche_field",
    "expert_param_vector",
    "neural_field",
    "init_neural_field",
    "roche_real_field",
    "init_roche_real_field",
    "neural_real_field",
    "init_neural_real_field",
    "neural_real_2nd_field",
    "init_neural_real_2nd_field",
    "EXPERT_DIM",
]
