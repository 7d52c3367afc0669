"""Variational posterior encoders.

TPU-native re-design of the reference encoders: the per-timestep Python LSTM
loops (model.py:418-422, 98-100, 226-229) become a single `lax.scan`, and all
randomness is explicit PRNG keys. Each encoder is an (init, apply) pair with
params as a pytree; `apply` returns the posterior statistics.

Model-name strings match the reference so checkpoint paths compose
identically (model.py:1133).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DTYPE
from . import flows, nn, priors


# --- EncoderLSTM (simulation; model.py:383-440) --------------------------------


class EncoderLSTMSpec(NamedTuple):
    input_dim: int
    hidden_dim: int
    output_dim: int
    normalize: bool = True
    model_name: str = "LSTMEncoder"


def init_encoder_lstm(key, spec: EncoderLSTMSpec, dtype=DTYPE):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lstm": nn.lstm_init(k1, spec.input_dim, spec.hidden_dim, dtype),
        "lin": nn.linear_init(k2, spec.hidden_dim, spec.output_dim, dtype=dtype),
        "log_var": nn.linear_init(k3, spec.hidden_dim, spec.output_dim, dtype=dtype),
    }


def encoder_lstm_apply(params, spec: EncoderLSTMSpec, x, a, mask):
    """(T,B,obs) observations + (T,B,A) actions + mask -> (mu, log_var).

    Runs the LSTM backwards in time over mask-zeroed inputs; the
    `exp(mu)/10`, `log_var - 5` positivity normalization (model.py:430-438)
    is required by the Exponential prior.
    """
    y_in = jnp.concatenate([x, a], axis=-1)
    mask_in = jnp.concatenate([mask, jnp.ones_like(a)], axis=-1)
    out = nn.lstm_scan(params["lstm"], y_in * mask_in, spec.hidden_dim, reverse=True)

    mu = nn.linear_apply(params["lin"], out)
    log_var = nn.linear_apply(params["log_var"], out)
    if spec.normalize:
        mu = jnp.exp(mu) / 10.0
        log_var = log_var - 5.0
    return mu, log_var


# --- EncoderPlanarLSTM (flow posterior; model.py:48-153) ------------------------


class EncoderPlanarLSTMSpec(NamedTuple):
    input_dim: int
    hidden_dim: int
    output_dim: int
    num_flows: int
    normalize: bool = True
    model_name: str = "PlanarLSTMEncoder"


def init_encoder_planar_lstm(key, spec: EncoderPlanarLSTMSpec, dtype=DTYPE):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    return {
        "lstm": nn.lstm_init(k1, spec.input_dim, spec.hidden_dim, dtype),
        "lin": nn.linear_init(k2, spec.hidden_dim, spec.output_dim, dtype=dtype),
        "log_var": nn.linear_init(k3, spec.hidden_dim, spec.output_dim, dtype=dtype),
        "amor_u": nn.linear_init(k4, spec.hidden_dim, spec.num_flows * spec.output_dim, dtype=dtype),
        "amor_w": nn.linear_init(k5, spec.hidden_dim, spec.num_flows * spec.output_dim, dtype=dtype),
        "amor_b": nn.linear_init(k6, spec.hidden_dim, spec.num_flows, dtype=dtype),
    }


def encoder_planar_lstm_apply(params, spec: EncoderPlanarLSTMSpec, x, a, mask):
    """Returns (mu, log_var, u, w, b) with amortized flow parameters
    (model.py:87-126)."""
    B = x.shape[1]
    y_in = jnp.concatenate([x, a], axis=-1)
    mask_in = jnp.concatenate([mask, jnp.ones_like(a)], axis=-1)
    out = nn.lstm_scan(params["lstm"], y_in * mask_in, spec.hidden_dim, reverse=True)

    mu = nn.linear_apply(params["lin"], out)
    log_var = nn.linear_apply(params["log_var"], out)
    u = nn.linear_apply(params["amor_u"], out).reshape(B, spec.num_flows, spec.output_dim, 1)
    w = nn.linear_apply(params["amor_w"], out).reshape(B, spec.num_flows, 1, spec.output_dim)
    b = nn.linear_apply(params["amor_b"], out).reshape(B, spec.num_flows, 1, 1)

    if spec.normalize:
        mu = jnp.exp(mu) / 10.0
        log_var = log_var - 5.0
    return mu, log_var, u, w, b


def planar_reparameterize(key, encoder_out, num_flows: int, eps=None):
    """Sample z0, push through the planar flows, then the fixed exp(z-5)
    positivity layer with its log-det (model.py:128-147).

    `eps` optionally overrides the base-Gaussian draw (see
    priors.gaussian_reparameterize). Returns (mu, log_var, z_final,
    log_det_j, z0).
    """
    mu, log_var, u, w, b = encoder_out
    z0 = priors.gaussian_reparameterize(key, mu, log_var, eps=eps)
    z = z0
    log_det_j = 0.0
    for k in range(num_flows):
        z, ldj = flows.planar_flow(z, u[:, k], w[:, k], b[:, k])
        log_det_j = log_det_j + ldj
    z_exp = jnp.exp(z - 5.0)
    log_det_j = log_det_j + jnp.sum(z - 5.0, axis=-1)
    return mu, log_var, z_exp, log_det_j, z0


def planar_log_density(mu, log_var, z_final, log_det_j, z0):
    """log q(z_final) = log q0(z0) - log|det J| (model.py:149-153)."""
    return priors.gaussian_log_density(mu, log_var, z0) - log_det_j


# --- EncoderLSTMReal (real data; model.py:180-242) ------------------------------


class EncoderLSTMRealSpec(NamedTuple):
    input_dim: int
    hidden_dim: int
    output_dim: int
    output_all: bool = False
    reverse: bool = True
    model_name: str = "LSTMReal"


def init_encoder_lstm_real(key, spec: EncoderLSTMRealSpec, dtype=DTYPE):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lstm": nn.lstm_init(k1, spec.input_dim, spec.hidden_dim, dtype),
        "lin": nn.mlp_init(k2, [spec.hidden_dim, spec.hidden_dim + 1, spec.output_dim], dtype=dtype),
        "log_var": nn.mlp_init(k3, [spec.hidden_dim, spec.hidden_dim + 1, spec.output_dim], dtype=dtype),
    }


def encoder_lstm_real_apply(params, spec: EncoderLSTMRealSpec, x, a, m):
    """Forward (or flipped) LSTM over [x, a, t/max(mask)] (model.py:210-242).

    Heads are 2-layer tanh MLPs. The reference's time feature divides the
    index by mask.max() — reproduced verbatim (a 0/1 mask makes it raw time).
    """
    if spec.reverse:
        x, a, m = x[::-1], a[::-1], m[::-1]

    T, B = m.shape[0], m.shape[1]
    t_feat = jnp.arange(T, dtype=x.dtype)[:, None, None] / jnp.max(m)
    t_feat = jnp.broadcast_to(t_feat, (T, B, 1))
    x_in = jnp.concatenate([x, a, t_feat], axis=-1)

    hs = nn.lstm_scan(params["lstm"], x_in, spec.hidden_dim, reverse=False, return_all=True)

    mu = nn.mlp_apply(params["lin"], hs, final_activation=jnp.tanh)
    log_var = nn.mlp_apply(params["log_var"], hs, final_activation=jnp.tanh)

    if spec.output_all:
        return mu, log_var
    return mu[-1], log_var[-1]


# --- LSTMBaseline (discrete supervised baseline; model.py:322-380) --------------


class LSTMBaselineSpec(NamedTuple):
    input_dim: int
    hidden_dim: int
    output_dim: int
    model_name: str = "LSTMBaseline"


def init_lstm_baseline(key, spec: LSTMBaselineSpec, dtype=DTYPE):
    k1, k2 = jax.random.split(key)
    return {
        "lstm": nn.lstm_init(k1, spec.input_dim, spec.hidden_dim, dtype),
        "out": nn.mlp_init(k2, [spec.hidden_dim, spec.hidden_dim + 1, spec.output_dim], dtype=dtype),
    }


def lstm_baseline_apply(params, spec: LSTMBaselineSpec, x, a, mask):
    y_in = jnp.concatenate([x, a], axis=-1)
    hs = nn.lstm_scan(params["lstm"], y_in, spec.hidden_dim, return_all=True)
    return nn.mlp_apply(params["out"], hs, activation=nn.elu)


def lstm_baseline_loss(params, spec: LSTMBaselineSpec, batch):
    """Masked next-step MSE (model.py:359-373)."""
    x, a, mask, s = batch["measurements"], batch["actions"], batch["masks"], batch["statics"]
    a_in = jnp.concatenate([a, s], axis=-1)
    x_hat = lstm_baseline_apply(params, spec, x, a_in, mask)[:-1]
    return jnp.sum((x[1:] - x_hat) ** 2 * mask[1:]) / x.shape[1]
