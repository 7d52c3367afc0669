"""Gaussian reparameterization and priors.

Reference: model.py:18-45 (GaussianReparam, StandardNormalPrior,
ExponentialPrior). Pure functions; randomness is explicit via PRNG keys.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def gaussian_reparameterize(key, mu, log_var, eps=None):
    """z = mu + eps * exp(log_var / 2), eps ~ N(0, I).

    `eps` overrides the draw (same shape as mu) — used by the sharded eval
    path, where each shard slices its block of a globally-drawn eps so the
    result is layout-invariant (JAX PRNG draws depend on the array shape).
    """
    std = jnp.exp(0.5 * log_var)
    if eps is None:
        eps = jax.random.normal(key, mu.shape, mu.dtype)
    return eps * std + mu


def gaussian_log_density(mu, log_var, z):
    """sum_d log N(z_d | mu_d, exp(log_var_d)) over the last axis."""
    lp = -0.5 * (_LOG_2PI + log_var + (z - mu) ** 2 / jnp.exp(log_var))
    return jnp.sum(lp, axis=-1)


def standard_normal_log_density(z):
    """Reference: model.py:34-38."""
    return jnp.sum(-0.5 * (_LOG_2PI + z**2), axis=-1)


def exponential_log_density(z, rate: float = 100.0):
    """log Exponential(rate).pdf summed over the last axis (model.py:41-45).

    Like torch with validation off, no support check is applied — callers
    clamp z to positive values first (model.py:1205 semantics).
    """
    return jnp.sum(math.log(rate) - rate * z, axis=-1)
