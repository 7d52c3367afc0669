"""Data generation and loading."""

from .real import RealCohort, make_real_standin
from .synthetic import SyntheticCohort, add_noise, make_dim_cohort, make_test_cohort, make_train_cohort

__all__ = [
    "SyntheticCohort",
    "make_train_cohort",
    "make_test_cohort",
    "make_dim_cohort",
    "add_noise",
    "RealCohort",
    "make_real_standin",
]
