"""Minimal functional NN primitives (params as pytrees).

The framework is deliberately flax-free: every module is a pair of
`init(key, ...) -> params` and `apply(params, x) -> y` pure functions, which
keeps the ODE vector fields trivially traceable and the train step a single
jitted function of (params, batch, rng).

Initializers follow PyTorch's defaults (nn.Linear / nn.LSTM: U(-k, k) with
k = 1/sqrt(fan_in) resp. 1/sqrt(hidden)), so parameter scales — and therefore
training dynamics — statistically match the reference models.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..config import DTYPE


def _uniform(key, shape, bound, dtype=DTYPE):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# --- Linear -------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=DTYPE):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    p = {"w": _uniform(kw, (in_dim, out_dim), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_dim,), bound, dtype)
    return p


def linear_apply(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


# --- MLP (sequence of Linear + activation) -------------------------------------


def mlp_init(key, dims: Sequence[int], bias: bool = True, dtype=DTYPE):
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, dims[i], dims[i + 1], bias=bias, dtype=dtype) for i, k in enumerate(keys)]


def mlp_apply(params, x, activation=jnp.tanh, final_activation=None):
    """Apply Linear/act/.../Linear[/final_act]."""
    for i, p in enumerate(params):
        x = linear_apply(p, x)
        if i < len(params) - 1:
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x


# --- LSTM cell ------------------------------------------------------------------


def lstm_init(key, in_dim: int, hidden_dim: int, dtype=DTYPE):
    """Single-layer LSTM parameters, PyTorch convention (gate order i,f,g,o)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(jnp.asarray(hidden_dim, jnp.float32))
    return {
        "w_ih": _uniform(k1, (in_dim, 4 * hidden_dim), bound, dtype),
        "w_hh": _uniform(k2, (hidden_dim, 4 * hidden_dim), bound, dtype),
        "b_ih": _uniform(k3, (4 * hidden_dim,), bound, dtype),
        "b_hh": _uniform(k4, (4 * hidden_dim,), bound, dtype),
    }


def lstm_cell(p, x, state):
    """One LSTM step: x (B, in), state ((B, H), (B, H)) -> (h, (h, c))."""
    h, c = state
    gates = x @ p["w_ih"] + h @ p["w_hh"] + p["b_ih"] + p["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, (h, c)


def lstm_scan(p, xs, hidden_dim: int, reverse: bool = False, return_all: bool = False):
    """Run an LSTM over a (T, B, in) sequence via lax.scan.

    Replaces the reference's Python-level per-step loops
    (model.py:418-422, model.py:98-100, model.py:226-229) with a single
    compiled scan — the TPU-native treatment of the time axis.
    """
    B = xs.shape[1]
    h0 = jnp.zeros((B, hidden_dim), xs.dtype)
    c0 = jnp.zeros((B, hidden_dim), xs.dtype)

    def step(state, x):
        h, state = lstm_cell(p, x, state)
        return state, h

    (hT, _), hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    if return_all:
        return hs  # (T, B, H)
    # With reverse=True, the "final" output in reference terms is the one
    # produced at t=0 (the last step of the backwards pass) = hs[0].
    return hs[0] if reverse else hs[-1]


def elu(x):
    return jax.nn.elu(x)
