"""Shared CLI plumbing: method-string -> VIModel construction.

Mirrors the reference's method dispatch (run_simulation.py:84-115,
run_simulation.py:194-209) so the same flags produce the same model family.
"""

from __future__ import annotations

import os

import jax

from ..config import DataConfig, dim8_config, dim12_config
from ..inference import VIModel
from ..models.decoders import RealBenchmarkSpec, RealDecoderSpec, SimDecoderSpec
from ..models.encoders import EncoderLSTMRealSpec, EncoderLSTMSpec, EncoderPlanarLSTMSpec


def enable_compile_cache():
    from ..utils.cache import host_keyed_cache_dir

    base = os.environ.get("HYBRIDODE_CACHE", os.path.join(os.getcwd(), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", host_keyed_cache_dir(base))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def resolve_data_config(name: str | None, sample: int) -> DataConfig:
    if name == "dim8":
        return dim8_config
    if name == "dim12":
        return dim12_config
    return DataConfig(n_sample=sample)


def build_sim_model(
    method: str,
    data_config: DataConfig,
    encoder_output_dim: int | None = None,
    elbo: bool = True,
    ode_method: str = "dopri5",
    ablate: bool = False,
    mc_size: int = 100,
    max_steps: int | None = None,
    rtol: float = 1e-7,
    atol: float = 1e-8,
    flow: bool = False,
    num_flows: int = 4,
    lockstep: bool = False,
) -> VIModel:
    """expert / neural / hybrid -> VIModel (run_simulation.py:79-115).

    expert: 4 encoder latents, Roche field, Exponential prior, positivity
    normalization. neural: full latents, black-box field, analytic-normal KL,
    no normalization. hybrid: full latents, Roche+ml field, Exponential prior.
    """
    obs = data_config.obs_dim
    act = data_config.action_dim
    neural = method == "neural"
    if encoder_output_dim is None:
        encoder_output_dim = 4 if method == "expert" else data_config.latent_dim

    normalize = not neural
    prior = None if neural else "exponential"
    roche = not neural
    if max_steps is None:
        # Roche fields run per-sample adaptive control (max ~112 steps per
        # patient + rejections); the smooth neural field needs ~25 lockstep
        # steps and keeps the generous default budget (early exit makes
        # unused budget nearly free under lockstep). A lockstep Roche solve
        # shares one controller across the batch, so its demand is the
        # batch-WORST trajectory plus the union of rejections — it runs on
        # the while_loop adjoint (budget is a runtime bound there, so a
        # generous cap is free; the bounded scan's compile time would scale
        # with it).
        max_steps = (4096 if lockstep else 256) if roche else 512

    hidden = int(obs * 2.0)  # encoder_latent_ratio=2.0 (sim_config.py:42)
    if flow:
        enc = EncoderPlanarLSTMSpec(obs + act, hidden, encoder_output_dim, num_flows=num_flows, normalize=normalize)
    else:
        enc = EncoderLSTMSpec(obs + act, hidden, encoder_output_dim, normalize=normalize)
    dec = SimDecoderSpec(
        obs,
        encoder_output_dim,
        act,
        t_max=data_config.t_max,
        step_size=data_config.step_size,
        roche=roche,
        ablate=ablate,
        method=ode_method,
        max_steps=max_steps,
        rtol=rtol,
        atol=atol,
        # Per-sample adaptive control is the TPU-native default for the stiff
        # Roche field; `lockstep` forces the reference's one-controller-per-
        # batch schedule (torchdiffeq semantics) for step-space parity A/Bs,
        # implemented on the while_loop adjoint solver (use_adjoint).
        per_sample_control=roche and not lockstep,
        use_adjoint=roche and lockstep,
        max_record=1024 if (roche and lockstep) else None,
    )
    return VIModel(
        kind="flow" if flow else "sim",
        encoder_spec=enc,
        decoder_spec=dec,
        elbo=elbo,
        prior=prior,
        mc_size=mc_size,
    )


def build_real_model(
    method: str,
    obs_dim: int,
    action_dim: int,
    static_dim: int,
    t_max: int,
    step_size: float,
    encoder_output_dim: int = 20,
    encoder_latent_ratio: float = 1.2,
    ode_method: str = "explicit_adams",
    ode_step_div: int = 1,
    t0: int = 24,
    weight: bool = False,
) -> VIModel:
    """neural / hybrid / expert / 2nd / tlstm / gruode (run_real.py:38-72)."""
    input_dim = obs_dim + action_dim + static_dim + 1
    enc = EncoderLSTMRealSpec(input_dim, int(input_dim * encoder_latent_ratio), encoder_output_dim, reverse=False)

    hidden_dim = int((obs_dim + action_dim + static_dim) * encoder_latent_ratio)
    if method in ("hybrid", "neural", "2nd", "expert"):
        dec = RealDecoderSpec(
            obs_dim,
            encoder_output_dim,
            action_dim,
            static_dim,
            hidden_dim,
            t_max=t_max,
            step_size=step_size,
            t0=t0,
            method=ode_method,
            ode_step_size=step_size / ode_step_div,
            ode_type=method,
        )
    else:
        dec = RealBenchmarkSpec(
            obs_dim,
            encoder_output_dim,
            action_dim,
            static_dim,
            hidden_dim,
            t_max=t_max,
            step_size=step_size,
            t0=t0,
            ode_type=method,
        )
    return VIModel(kind="real", encoder_spec=enc, decoder_spec=dec, elbo=False, t0=t0, weight=weight)


def run_batched_experiment(key, model, dg, *, n_restart, niters, batch_size, lr,
                           test_freq, path, best_on_disk, early_stop, shuffle,
                           val_criterion, val_t0, curve_path, events_path,
                           restart_mode, restart_devices, dp_devices=None):
    """Draw the sequential CLI's restart-key chain (host_split, one triple per
    restart — draw-for-draw identical to the seq loop) and run the whole
    experiment as ONE batched device program (--restart_mode=vmap/shard).

    Shared by run_simulation and run_simulation_flow so the key-chain parity
    contract and the shard/dp device resolution live in one place.
    Returns (key, params, best_on_disk).
    """
    from ..inference.fused import fused_experiment_loop
    from ..utils.hostrng import host_split

    restart_keys = []
    for _ in range(n_restart):
        key, k_init, k_train = host_split(key, 3)
        restart_keys.append((k_init, k_train))
    shard = restart_mode == "shard"
    params, best_on_disk, _ = fused_experiment_loop(
        niters=niters, data_generator=dg, model=model, restart_keys=restart_keys,
        batch_size=batch_size, lr=lr, test_freq=test_freq, path=path,
        best_on_disk=best_on_disk, early_stop=early_stop, shuffle=shuffle,
        val_criterion=val_criterion, val_t0=val_t0, curve_path=curve_path,
        events_path=events_path,
        restart_devices=(restart_devices or n_restart) if shard else None,
        dp_devices=dp_devices if shard else None,
    )
    return key, params, best_on_disk
