"""Data generation and loading."""

from .synthetic import SyntheticCohort, add_noise, make_dim_cohort, make_test_cohort, make_train_cohort

__all__ = ["SyntheticCohort", "make_train_cohort", "make_test_cohort", "make_dim_cohort", "add_noise"]
