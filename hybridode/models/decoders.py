"""Decoders: initial latent state -> ODE solve -> observation head.

TPU-native re-design of the reference decoders:
* `sim_decoder_*`        <- RocheExpertDecoder (model.py:1030-1121)
* `real_decoder_*`       <- DecoderReal        (model.py:772-862)
* `real_benchmark_*`     <- DecoderRealBenchmark + GRUODECell (model.py:865-966)

The dose schedule is extracted from the action array into an explicit context
(no `set_action` mutation); solver settings live in the spec. Vector-field
selection is static (spec.ode_type), so each variant jit-compiles its own
specialized program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE, RocheConfig
from ..fields import (
    CumDoseContext,
    doses_from_actions,
    init_neural_field,
    init_neural_real_2nd_field,
    init_neural_real_field,
    init_roche_field,
    init_roche_real_field,
    neural_field,
    neural_real_2nd_field,
    neural_real_field,
    roche_field,
    roche_real_field,
)
from ..solvers import odeint
from . import nn


# --- Simulation decoder ---------------------------------------------------------


class SimDecoderSpec(NamedTuple):
    obs_dim: int
    latent_dim: int
    action_dim: int
    t_max: float
    step_size: float
    roche: bool = True
    ablate: bool = False
    method: str = "dopri5"
    rtol: float = 1e-7
    atol: float = 1e-8
    ode_step_size: Optional[float] = None
    max_steps: int = 512
    # Per-patient adaptive step control (vmapped solver) instead of
    # torchdiffeq's batch-lockstep controller. Documented deviation: lockstep
    # couples every patient to the batch-worst step schedule — a numerical
    # artifact of batched torchdiffeq, not a modeling choice. Per-sample
    # control is more accurate per patient and ~2-3x cheaper on TPU
    # (measured: max 112 steps/patient vs 280 lockstep at init).
    per_sample_control: bool = False
    # Custom-VJP backward over ACCEPTED steps only (solvers/adjoint.py):
    # same discretize-then-optimize gradients, no rejected-trial replay.
    # Under per-sample vmap the bounded scan's early exit degenerates to
    # select, so the while_loop forward also stops at the true trial count.
    use_adjoint: bool = False
    # Backward record budget (accepted steps kept per trajectory); None ->
    # max_steps. Observed demand: <=112 accepts/patient on the dose_max=10
    # cohorts at rtol=1e-7.
    max_record: Optional[int] = None

    @property
    def model_name(self) -> str:
        # Reference naming (model.py:1055-1064) — keeps checkpoint paths
        # compatible with the reference's shell tooling.
        if self.roche:
            name = "ExpertDecoder" if self.latent_dim == 4 else "HybridDecoder"
        else:
            name = "NeuralODEDecoder"
        return name + ("Ablate" if self.ablate else "")

    @property
    def ts(self) -> np.ndarray:
        # Evaluation grid arange(0, t_max + step, step) (model.py:1072).
        return np.arange(0.0, self.t_max + self.step_size, self.step_size, dtype=np.float32)

    @property
    def n_substeps(self) -> int:
        if self.ode_step_size is None:
            return 1
        return max(1, int(round(self.step_size / self.ode_step_size)))


def init_sim_decoder(key, spec: SimDecoderSpec, roche_config: RocheConfig | None = None, dtype=DTYPE):
    k1, k2 = jax.random.split(key)
    if spec.roche:
        ode = init_roche_field(k1, spec.latent_dim, roche_config, ablate=spec.ablate, dtype=dtype)
    else:
        ode = init_neural_field(k1, spec.latent_dim, dtype=dtype)
    return {
        "ode": ode,
        "output": nn.linear_init(k2, spec.latent_dim, spec.obs_dim, dtype=dtype),
    }


def sim_decoder_apply(params, spec: SimDecoderSpec, init, actions):
    """(B, D) initial latents + (T, B, A) actions -> (x_hat, h)."""
    ctx = doses_from_actions(actions, spec.step_size)
    field = roche_field if spec.roche else neural_field
    ts = jnp.asarray(spec.ts)

    if spec.method == "dopri5" and (spec.per_sample_control or spec.use_adjoint):
        from ..solvers import odeint_dopri5, odeint_dopri5_adjoint

        solver = odeint_dopri5_adjoint if spec.use_adjoint else odeint_dopri5
        extra = {"max_record": spec.max_record} if spec.use_adjoint else {}
        if spec.per_sample_control:
            CtxType = type(ctx)

            def solve_one(z_i, times_i, amounts_i):
                ys, _ = solver(
                    field,
                    z_i,
                    ts,
                    (params["ode"], CtxType(times=times_i, amounts=amounts_i)),
                    rtol=spec.rtol,
                    atol=spec.atol,
                    max_steps=spec.max_steps,
                    **extra,
                )
                return ys  # (T, D)

            h = jax.vmap(solve_one, in_axes=(0, 0, 0), out_axes=1)(init, ctx.times, ctx.amounts)
        else:
            # Batched lockstep via the while_loop adjoint: ONE error-norm
            # controller for the whole (B, D) state — exactly torchdiffeq's
            # batched-dopri5 semantics (reference model.py:1116-1118) — and,
            # unlike the bounded-scan path, the trial budget doesn't inflate
            # compile time (while_loop bounds are runtime values).
            h, _ = solver(
                field,
                init,
                ts,
                (params["ode"], ctx),
                rtol=spec.rtol,
                atol=spec.atol,
                max_steps=spec.max_steps,
                **extra,
            )
    else:
        # Measured: barrier-clipping at the dose grid costs MORE steps here
        # (280 -> 465) — the controller absorbs the depot jumps cheaply and
        # barriers fragment its natural large steps. The solver supports
        # `barriers` for genuinely stiff forcing schedules.
        h = odeint(
            field,
            init,
            ts,
            (params["ode"], ctx),
            method=spec.method,
            rtol=spec.rtol,
            atol=spec.atol,
            step_size=spec.ode_step_size,
            n_substeps=spec.n_substeps,
            max_steps=spec.max_steps,
        )
    x_hat = nn.linear_apply(params["output"], h)
    return x_hat, h


# --- Real-data decoder ----------------------------------------------------------

_REAL_FIELDS = {
    "neural": neural_real_field,
    "2nd": neural_real_2nd_field,
    "hybrid": roche_real_field,
    "expert": roche_real_field,
}


class RealDecoderSpec(NamedTuple):
    obs_dim: int
    latent_dim: int
    action_dim: int
    static_dim: int
    hidden_dim: int
    t_max: int
    step_size: float
    t0: int = 0
    method: str = "explicit_adams"
    ode_step_size: Optional[float] = None
    ode_type: str = "neural"
    rtol: float = 1e-7
    atol: float = 1e-8
    max_steps: int = 512

    @property
    def model_name(self) -> str:
        return "DecoderReal_" + self.ode_type

    @property
    def ts(self) -> np.ndarray:
        # Grid arange(t0-1, t_max, step) (model.py:821).
        return np.arange(self.t0 - 1, self.t_max, self.step_size, dtype=np.float32)

    @property
    def n_substeps(self) -> int:
        if self.ode_step_size is None:
            return 1
        return max(1, int(round(self.step_size / self.ode_step_size)))


def init_real_decoder(key, spec: RealDecoderSpec, dtype=DTYPE):
    k1, k2 = jax.random.split(key)
    if spec.ode_type in ("hybrid", "expert"):
        ode = init_roche_real_field(k1, spec.latent_dim, spec.hidden_dim, dtype=dtype)
    elif spec.ode_type == "2nd":
        ode = init_neural_real_2nd_field(k1, spec.latent_dim, spec.action_dim, spec.hidden_dim, dtype=dtype)
    else:
        ode = init_neural_real_field(k1, spec.latent_dim, spec.action_dim, spec.hidden_dim, dtype=dtype)
    return {
        "ode": ode,
        "output": nn.mlp_init(k2, [spec.latent_dim, spec.latent_dim + 1, spec.obs_dim], dtype=dtype),
    }


def _real_output(params, h):
    return nn.mlp_apply(params["output"], h, activation=nn.elu)


def real_decoder_apply(params, spec: RealDecoderSpec, init, actions, statics):
    """Real-data decode (model.py:833-862).

    Rank-2 `init` (B, D): one solve over the whole grid. Rank-3 `init`
    (T', B, D): the reference's per-interval loop of 2-point solves becomes a
    single vmap over intervals — each interval integrates its own initial
    state over [t_i, t_{i+1}], with a zero row prepended.
    """
    ctx = CumDoseContext(actions=actions)
    field = _REAL_FIELDS[spec.ode_type]
    ts = jnp.asarray(spec.ts)

    if init.ndim == 2:
        h = odeint(
            field,
            init,
            ts,
            (params["ode"], ctx),
            method=spec.method,
            step_size=spec.ode_step_size,
            n_substeps=spec.n_substeps,
            rtol=spec.rtol,
            atol=spec.atol,
            max_steps=spec.max_steps,
        )
        x_hat = _real_output(params, h)[1:]
        return x_hat, h

    n_intervals = spec.t_max - 1

    def solve_interval(init_i, ts_pair):
        ys = odeint(
            field,
            init_i,
            ts_pair,
            (params["ode"], ctx),
            method=spec.method,
            step_size=spec.ode_step_size,
            n_substeps=spec.n_substeps,
            rtol=spec.rtol,
            atol=spec.atol,
            max_steps=spec.max_steps,
        )
        return ys[-1]

    ts_pairs = jnp.stack([ts[:n_intervals], ts[1 : n_intervals + 1]], axis=-1)
    h_tail = jax.vmap(solve_interval)(init[:n_intervals], ts_pairs)
    h = jnp.concatenate([jnp.zeros_like(h_tail[:1]), h_tail], axis=0)
    x_hat = _real_output(params, h)[1:]
    x_hat = x_hat.at[0].set(0.0)
    return x_hat, h


# --- Discrete-time benchmark decoders (tlstm / gruode) ---------------------------


class RealBenchmarkSpec(NamedTuple):
    obs_dim: int
    latent_dim: int
    action_dim: int
    static_dim: int
    hidden_dim: int
    t_max: int
    step_size: float
    t0: int = 0
    ode_type: str = "tlstm"

    @property
    def model_name(self) -> str:
        return "DecoderReal_" + self.ode_type

    @property
    def ts(self) -> np.ndarray:
        return np.arange(self.t0, self.t_max, self.step_size, dtype=np.float32)


def init_real_benchmark(key, spec: RealBenchmarkSpec, dtype=DTYPE):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"output": nn.mlp_init(k2, [spec.latent_dim, spec.latent_dim + 1, spec.obs_dim], dtype=dtype)}
    if spec.ode_type == "tlstm":
        params["lstm"] = nn.lstm_init(k1, spec.action_dim * 2, spec.latent_dim, dtype)
    elif spec.ode_type == "gruode":
        # GRUODECell (model.py:865-886): bias-free linears on [h, a, time].
        params["lin_hz"] = nn.linear_init(k1, spec.latent_dim + 2, spec.latent_dim + 2, bias=False, dtype=dtype)
        params["lin_hn"] = nn.linear_init(k3, spec.latent_dim + 2, spec.latent_dim, bias=False, dtype=dtype)
    else:
        raise ValueError(spec.ode_type)
    return params


def gru_ode_cell(params, a, h):
    """One GRU-ODE evaluation (model.py:875-886).

    Note the reference quirk reproduced on purpose: the cell returns dh as the
    step *output* while the hidden state itself is threaded back unchanged —
    the benchmark's trajectory is the sequence of dh's.
    """
    hid = h.shape[-1]
    ha = jnp.concatenate([h, a], axis=-1)
    z = jax.nn.sigmoid(nn.linear_apply(params["lin_hz"], ha))
    n = jnp.tanh(nn.linear_apply(params["lin_hn"], z * ha))
    dh = (1 - z[..., :hid]) * (n - h)
    return dh, h


def real_benchmark_apply(params, spec: RealBenchmarkSpec, init, actions, statics):
    """Discrete unroll over the grid (model.py:942-966)."""
    ts = spec.ts
    idx = jnp.asarray(ts.astype(np.int32))
    a_seq = actions[idx]  # (T', B, A)
    time_feat = jnp.asarray(ts, actions.dtype)[:, None, None] / spec.t_max
    obs_seq = jnp.concatenate([a_seq, jnp.broadcast_to(time_feat, a_seq.shape)], axis=-1)

    if spec.ode_type == "tlstm":

        def step(state, obs):
            h, c = state
            h_new, (h2, c2) = nn.lstm_cell(params["lstm"], obs, (h, c))
            return (h2, c2), h_new

        _, hs = jax.lax.scan(step, (init, init), obs_seq)
    else:

        def step(h, obs):
            dh, h_next = gru_ode_cell(params, obs, h)
            return h_next, dh

        _, hs = jax.lax.scan(step, init, obs_seq)

    x_hat = _real_output(params, hs)
    return x_hat, hs
