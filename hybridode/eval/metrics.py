"""Evaluation: masked RMSE, vectorized CRPS, bootstrap SE, horizon curves.

Re-design of training_utils.py:100-576. The reference's CRPS is a triple
Python loop over (T, B, D) calling properscoring per scalar
(training_utils.py:157-177) — its hottest non-solver path. Here CRPS is a
closed-form sort-based estimator over the sample axis, vectorized across the
whole (T, B, D, MC) tensor on device; the Monte-Carlo posterior decodes are a
single vmap instead of a Python loop (training_utils.py:144-151).

The printed 4-line CSV tail ("rmse_z0,... / rmse_x,... / cprs_z0,... /
cprs_x,...") is the reference's machine interface (parsed by Fig3.sh:85-97)
and is preserved verbatim.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..inference.elbo import VIModel, decode, encode
from ..models import encoders, priors


def crps_ensemble(truth: jnp.ndarray, samples: jnp.ndarray) -> jnp.ndarray:
    """Empirical-CDF CRPS, identical estimator to properscoring.crps_ensemble.

    crps = mean_i |x_i - y| - (1/m^2) sum_i (2i + 1 - m) x_(i)
    (the second term is the sort-based O(m log m) form of
    0.5 * mean_{ij} |x_i - x_j|). `samples` has the ensemble on the LAST axis.
    """
    m = samples.shape[-1]
    abs_err = jnp.mean(jnp.abs(samples - truth[..., None]), axis=-1)
    sorted_s = jnp.sort(samples, axis=-1)
    coef = (2.0 * jnp.arange(m, dtype=samples.dtype) + 1.0 - m) / (m * m)
    spread = jnp.sum(coef * sorted_s, axis=-1)
    return abs_err - spread


def bootstrap_rmse(err_sq: np.ndarray, n_boot: int = 500, rng: Optional[np.random.RandomState] = None) -> float:
    """Bootstrap SE of RMSE over per-sample squared errors
    (training_utils.py:568-576), vectorized over resamples."""
    err_sq = np.asarray(err_sq)
    r = rng if rng is not None else np.random
    idx = r.randint(0, len(err_sq), size=(n_boot, len(err_sq)))
    rmse = np.sqrt(np.mean(err_sq[idx], axis=1))
    return float(np.std(rmse))


def _reparam(key, model: VIModel, encoder_out):
    """Posterior sample matching the model family's reparameterization."""
    if model.kind == "flow":
        _, _, z, _, _ = encoders.planar_reparameterize(key, encoder_out, model.encoder_spec.num_flows)
        return z
    mu, log_var = encoder_out
    return priors.gaussian_reparameterize(key, mu, log_var)


def _point_z0(model: VIModel, encoder_out, key):
    """Point estimate of z0: posterior mean (sim/real), or one flow sample
    (training_utils.py:305 for flows)."""
    if model.kind == "flow":
        _, _, z, _, _ = encoders.planar_reparameterize(key, encoder_out, model.encoder_spec.num_flows)
        return z
    return encoder_out[0]


def _masked_mean_sq_err(x, x_hat, mask, axes):
    """Per-patient masked mean squared error; patients with no observed
    entries are flagged NaN EXPLICITLY (the aggregators filter/nanmean them
    out) rather than via a silent 0/0."""
    denom = jnp.sum(mask, axis=axes)
    num = jnp.sum((x - x_hat) ** 2 * mask, axis=axes)
    return jnp.where(denom > 0, num / jnp.maximum(denom, 1.0), jnp.nan)


def _chunk_forward(params, model: VIModel, batch, t0: int, mc_itr: int, key):
    """Encode on [0, t0), decode the full horizon, plus mc_itr posterior
    decodes — all inside one jitted program."""
    x = batch["measurements"][:t0]
    a = batch["actions"][:t0]
    mask = batch["masks"][:t0]

    if model.kind == "real":
        a_in = jnp.concatenate([a, batch["statics"][:t0]], axis=-1)
        encoder_out = encode(params, model, x, a_in, mask)
    else:
        encoder_out = encode(params, model, x, a, mask)

    key, k_point = jax.random.split(key)
    z0_hat = _point_z0(model, encoder_out, k_point)
    x_hat, _ = decode(params, model, z0_hat, batch)

    def mc_one(k):
        z = _reparam(k, model, encoder_out)
        x_mc, _ = decode(params, model, z, batch)
        return z, x_mc

    z_mc, x_mc = jax.vmap(mc_one)(jax.random.split(key, mc_itr))  # (MC, B, D), (MC, T, B, D)
    return z0_hat, x_hat, z_mc, x_mc


@functools.partial(jax.jit, static_argnames=("model", "t0", "mc_itr", "expert_dim"))
def _eval_chunk(params, model: VIModel, batch, t0: int, mc_itr: int, expert_dim: int, key):
    z0 = batch["latents"][0]
    z0_hat, x_hat, z_mc, x_mc = _chunk_forward(params, model, batch, t0, mc_itr, key)

    x_hat = x_hat[t0:]
    x_test = batch["measurements"][t0:]
    mask_test = batch["masks"][t0:]

    # per-sample squared errors (training_utils.py:128-139)
    err_z0 = jnp.sum((z0[:, :expert_dim] - z0_hat[:, :expert_dim]) ** 2, axis=1)  # (B,)
    err_x = _masked_mean_sq_err(x_test, x_hat, mask_test, axes=(0, 2))  # (B,)

    # CRPS over posterior samples (training_utils.py:141-177), vectorized.
    z_samples = jnp.moveaxis(z_mc[:, :, :expert_dim], 0, -1)  # (B, D_e, MC)
    crps_z0 = jnp.mean(crps_ensemble(z0[:, :expert_dim], z_samples), axis=1)  # (B,)

    x_samples = jnp.moveaxis(x_mc[:, t0:], 0, -1)  # (T', B, D, MC)
    crps_x = jnp.mean(crps_ensemble(x_test, x_samples), axis=(0, 2))  # (B,)

    return err_z0, err_x, crps_z0, crps_x


def evaluate(params, model: VIModel, data_generator, batch_size: int, t0: int, mc_itr: int = 50, key=None,
             verbose: bool = True):
    """Reference `evaluate` / `evaluate_flow` (training_utils.py:100-201,
    282-380): point + probabilistic metrics with the stdout CSV contract."""
    if key is None:
        key = jax.random.PRNGKey(0)
    expert_dim = data_generator.expert_dim

    tot_err_z0, tot_err_x, tot_crps_z0, tot_crps_x = [], [], [], []
    for chunk in range(data_generator.test_size // batch_size):
        batch = data_generator.get_split("test", batch_size, chunk)
        key, k = jax.random.split(key)
        err_z0, err_x, crps_z0, crps_x = _eval_chunk(params, model, batch, t0, mc_itr, expert_dim, k)
        tot_err_z0.append(np.asarray(err_z0))
        tot_err_x.append(np.asarray(err_x))
        tot_crps_z0.append(np.asarray(crps_z0))
        tot_crps_x.append(np.asarray(crps_x))

    err_z0 = np.concatenate(tot_err_z0)
    rmse_z0 = float(np.sqrt(np.mean(err_z0)))
    rmse_z0_sd = bootstrap_rmse(err_z0)

    crps_z0 = np.concatenate(tot_crps_z0)
    cprs_z0 = float(np.mean(crps_z0))
    cprs_z0_sd = float(np.std(crps_z0) / np.sqrt(len(crps_z0)))

    err_x = np.concatenate(tot_err_x)
    err_x = err_x[~np.isnan(err_x)]
    rmse_x = float(np.sqrt(np.mean(err_x)))
    rmse_x_sd = bootstrap_rmse(err_x)

    crps_x = np.concatenate(tot_crps_x)
    cprs_x = float(np.mean(crps_x))
    cprs_x_sd = float(np.std(crps_x) / np.sqrt(len(crps_x)))

    if verbose:
        print("rmse_z0,{:.4f},{:.4f}".format(rmse_z0, rmse_z0_sd))
        print("rmse_x,{:.4f},{:.4f}".format(rmse_x, rmse_x_sd))
        print("cprs_z0,{:.4f},{:.4f}".format(cprs_z0, cprs_z0_sd))
        print("cprs_x,{:.4f},{:.4f}".format(cprs_x, cprs_x_sd))

    return rmse_z0, rmse_z0_sd, cprs_z0, rmse_x, rmse_x_sd, cprs_x


@functools.partial(jax.jit, static_argnames=("model", "t0", "mc_itr"))
def _horizon_chunk(params, model: VIModel, batch, t0: int, mc_itr: int, key):
    _, x_hat, _, x_mc = _chunk_forward(params, model, batch, t0, mc_itr, key)
    x_hat = x_hat[t0:]
    x_test = batch["measurements"][t0:]
    mask_test = batch["masks"][t0:]
    err_x = _masked_mean_sq_err(x_test, x_hat, mask_test, axes=(2,))  # (T', B)
    x_samples = jnp.moveaxis(x_mc[:, t0:], 0, -1)
    crps_x = jnp.mean(crps_ensemble(x_test, x_samples), axis=2)  # (T', B)
    return err_x, crps_x


def evaluate_horizon(params, model: VIModel, data_generator, batch_size: int, t0: int, mc_itr: int = 10, key=None):
    """Per-time-step RMSE/CRPS vectors (training_utils.py:204-279)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    tot_err_x, tot_crps_x = [], []
    for chunk in range(data_generator.test_size // batch_size):
        batch = data_generator.get_split("test", batch_size, chunk)
        key, k = jax.random.split(key)
        err_x, crps_x = _horizon_chunk(params, model, batch, t0, mc_itr, k)
        tot_err_x.append(np.asarray(err_x))
        tot_crps_x.append(np.asarray(crps_x))

    err_x = np.concatenate(tot_err_x, axis=1)  # (T', N)
    rmse_x = np.sqrt(np.nanmean(err_x, axis=1))
    rmse_x_sd = np.array([bootstrap_rmse(row[~np.isnan(row)]) for row in err_x])

    crps_x = np.concatenate(tot_crps_x, axis=1)
    cprs_x = np.mean(crps_x, axis=1)
    cprs_x_sd = np.std(crps_x, axis=1) / np.sqrt(crps_x.shape[1])

    return {"rmse_x": rmse_x, "rmse_x_sd": rmse_x_sd, "cprs_x": cprs_x, "cprs_x_sd": cprs_x_sd}


# --- ensembles -----------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("model_e", "model_m", "t0", "mc_itr", "expert_dim", "horizon"))
def _ensemble_chunk(params_e, model_e: VIModel, params_m, model_m: VIModel, batch, t0: int, mc_itr: int,
                    expert_dim: int, w_e, w_m, key, horizon: bool = False):
    z0 = batch["latents"][0]
    k1, k2 = jax.random.split(key)
    z0_e, xh_e, zmc_e, xmc_e = _chunk_forward(params_e, model_e, batch, t0, mc_itr, k1)
    _, xh_m, _, xmc_m = _chunk_forward(params_m, model_m, batch, t0, mc_itr, k2)

    x_hat = (xh_e * w_e + xh_m * w_m)[t0:]
    x_mc = xmc_e * w_e + xmc_m * w_m  # (MC, T, B, D)

    x_test = batch["measurements"][t0:]
    mask_test = batch["masks"][t0:]
    x_samples = jnp.moveaxis(x_mc[:, t0:], 0, -1)

    if horizon:
        err_x = _masked_mean_sq_err(x_test, x_hat, mask_test, axes=(2,))
        crps_x = jnp.mean(crps_ensemble(x_test, x_samples), axis=2)
        return err_x, crps_x

    err_z0 = jnp.sum((z0[:, :expert_dim] - z0_e[:, :expert_dim]) ** 2, axis=1)
    err_x = _masked_mean_sq_err(x_test, x_hat, mask_test, axes=(0, 2))
    z_samples = jnp.moveaxis(zmc_e[:, :, :expert_dim], 0, -1)
    crps_z0 = jnp.mean(crps_ensemble(z0[:, :expert_dim], z_samples), axis=1)
    crps_x = jnp.mean(crps_ensemble(x_test, x_samples), axis=(0, 2))
    return err_z0, err_x, crps_z0, crps_x


def evaluate_ensemble(params_e, model_e, params_m, model_m, data_generator, batch_size, t0,
                      mc_itr: int = 50, weight_expert=1.0, weight_ml=1.0, key=None, verbose: bool = True):
    """Weighted two-model ensemble eval (training_utils.py:383-486)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    expert_dim = data_generator.expert_dim
    w_e = jnp.asarray(weight_expert)
    w_m = jnp.asarray(weight_ml)

    tots = [[], [], [], []]
    for chunk in range(data_generator.test_size // batch_size):
        batch = data_generator.get_split("test", batch_size, chunk)
        key, k = jax.random.split(key)
        outs = _ensemble_chunk(params_e, model_e, params_m, model_m, batch, t0, mc_itr, expert_dim, w_e, w_m, k)
        for t, o in zip(tots, outs):
            t.append(np.asarray(o))

    err_z0, err_x, crps_z0, crps_x = (np.concatenate(t) for t in tots)
    rmse_z0 = float(np.sqrt(np.mean(err_z0)))
    rmse_z0_sd = bootstrap_rmse(err_z0)
    cprs_z0 = float(np.mean(crps_z0))
    err_x = err_x[~np.isnan(err_x)]  # drop fully-masked patients (see _masked_mean_sq_err)
    rmse_x = float(np.sqrt(np.mean(err_x)))
    rmse_x_sd = bootstrap_rmse(err_x)
    cprs_x = float(np.mean(crps_x))

    if verbose:
        print("rmse_z0,{:.4f},{:.4f}".format(rmse_z0, rmse_z0_sd))
        print("rmse_x,{:.4f},{:.4f}".format(rmse_x, rmse_x_sd))
        print("cprs_z0,{:.4f},{:.4f}".format(cprs_z0, float(np.std(crps_z0) / np.sqrt(len(crps_z0)))))
        print("cprs_x,{:.4f},{:.4f}".format(cprs_x, float(np.std(crps_x) / np.sqrt(len(crps_x)))))

    return rmse_z0, rmse_z0_sd, cprs_z0, rmse_x, rmse_x_sd, cprs_x


def evaluate_ensemble_horizon(params_e, model_e, params_m, model_m, data_generator, batch_size, t0,
                              mc_itr: int = 10, weight_expert=1.0, weight_ml=1.0, key=None):
    """Horizon variant of the ensemble eval.

    Deviation from the reference, documented: the reference aggregates and
    returns inside the first chunk iteration (indentation bug,
    training_utils.py:549-565); here all test chunks are aggregated.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    w_e = jnp.asarray(weight_expert)
    w_m = jnp.asarray(weight_ml)

    tot_err, tot_crps = [], []
    for chunk in range(data_generator.test_size // batch_size):
        batch = data_generator.get_split("test", batch_size, chunk)
        key, k = jax.random.split(key)
        err_x, crps_x = _ensemble_chunk(params_e, model_e, params_m, model_m, batch, t0, mc_itr,
                                        data_generator.expert_dim, w_e, w_m, k, horizon=True)
        tot_err.append(np.asarray(err_x))
        tot_crps.append(np.asarray(crps_x))

    err_x = np.concatenate(tot_err, axis=1)
    rmse_x = np.sqrt(np.nanmean(err_x, axis=1))
    rmse_x_sd = np.array([bootstrap_rmse(row[~np.isnan(row)]) for row in err_x])
    crps_x = np.concatenate(tot_crps, axis=1)
    return {
        "rmse_x": rmse_x,
        "rmse_x_sd": rmse_x_sd,
        "cprs_x": np.mean(crps_x, axis=1),
        "cprs_x_sd": np.std(crps_x, axis=1) / np.sqrt(crps_x.shape[1]),
    }
