"""Two-axis (patients x MC-samples) sharded evaluation.

The evaluation stage (reference training_utils.py:100-201) is the framework's
heaviest inference workload: `mc_itr` (50) posterior ODE decodes for every
test patient (2100). Its two independent axes map onto a 2-D device mesh:

* ``data``: the patient/batch axis — each shard encodes + decodes its own
  patients (same DP layout as training);
* ``mc``: the Monte-Carlo sample axis — each shard decodes `mc_itr / n_mc`
  posterior samples for the full local patient block.

CRPS is a rank statistic over the complete sample set, so the MC shards
exchange their decodes with one `all_gather` over the ``mc`` axis (riding ICI
on real hardware); per-patient metrics then come out bit-identical across mc
shards and are reassembled across ``data`` shards by the out_specs. The
result matches the single-device `_eval_chunk` to float tolerance — same
keys, same estimator, different layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..eval.metrics import _masked_mean_sq_err, crps_ensemble
from ..inference.elbo import VIModel, decode, encode
from ..models import encoders, priors


def _reparam_block(key, model: VIModel, encoder_out, shard_idx, n_shards):
    """Posterior sample for the local patient block, bit-identical to the
    single-device draw: every shard draws the full-batch eps with the same
    key and slices its own block (JAX PRNG values depend on the draw shape,
    so a local-shape draw would diverge from the unsharded estimator)."""
    mu = encoder_out[0]
    b_loc, d = mu.shape
    eps_full = jax.random.normal(key, (b_loc * n_shards, d), mu.dtype)
    eps = jax.lax.dynamic_slice_in_dim(eps_full, shard_idx * b_loc, b_loc, 0)
    if model.kind == "flow":
        _, _, z, _, _ = encoders.planar_reparameterize(
            key, encoder_out, model.encoder_spec.num_flows, eps=eps)
        return z
    mu, log_var = encoder_out
    return priors.gaussian_reparameterize(key, mu, log_var, eps=eps)


def _point_z0_block(model: VIModel, encoder_out, key, shard_idx, n_shards):
    """Point z0 (posterior mean; one flow sample for flows) on the local
    block, matching eval.metrics._point_z0."""
    if model.kind == "flow":
        return _reparam_block(key, model, encoder_out, shard_idx, n_shards)
    return encoder_out[0]


def make_mesh_2d(n_data: int, n_mc: int, devices=None,
                 axis_names=("data", "mc")) -> Mesh:
    """2-D mesh over the first n_data*n_mc devices (default (data, mc))."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_mc
    if len(devices) < n:
        raise ValueError(
            f"requested a {n_data}x{n_mc} {axis_names} mesh but only "
            f"{len(devices)} devices are available")
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_mc), tuple(axis_names))


def make_sharded_eval_chunk(
    model: VIModel,
    mesh: Mesh,
    t0: int,
    mc_itr: int,
    expert_dim: int,
    data_axis: str = "data",
    mc_axis: str = "mc",
):
    """Jitted (params, batch, key) -> (err_z0, err_x, crps_z0, crps_x), the
    sharded twin of eval.metrics._eval_chunk (same key schedule, same math)."""
    n_mc_shards = mesh.shape[mc_axis]
    if mc_itr % n_mc_shards:
        raise ValueError(f"mc_itr={mc_itr} not divisible by mc shards={n_mc_shards}")

    def local(params, batch, k_point, mc_keys):
        x = batch["measurements"][:t0]
        a = batch["actions"][:t0]
        mask = batch["masks"][:t0]
        if model.kind == "real":
            a_in = jnp.concatenate([a, batch["statics"][:t0]], axis=-1)
            encoder_out = encode(params, model, x, a_in, mask)
        else:
            encoder_out = encode(params, model, x, a, mask)

        i_data = jax.lax.axis_index(data_axis)
        n_data = mesh.shape[data_axis]
        z0_hat = _point_z0_block(model, encoder_out, k_point, i_data, n_data)
        x_hat, _ = decode(params, model, z0_hat, batch)

        def mc_one(k):
            z = _reparam_block(k, model, encoder_out, i_data, n_data)
            x_mc, _ = decode(params, model, z, batch)
            return z, x_mc

        # local slice of the global MC sample set ...
        z_mc, x_mc = jax.vmap(mc_one)(mc_keys)  # (MC_loc, B_loc, D), (MC_loc, T, B_loc, D)
        # ... exchanged so every mc shard holds all samples (CRPS sorts them).
        z_mc = jax.lax.all_gather(z_mc, mc_axis, axis=0, tiled=True)  # (MC, B_loc, D)
        x_mc = jax.lax.all_gather(x_mc, mc_axis, axis=0, tiled=True)  # (MC, T, B_loc, D)

        z0 = batch["latents"][0]
        x_hat = x_hat[t0:]
        x_test = batch["measurements"][t0:]
        mask_test = batch["masks"][t0:]

        err_z0 = jnp.sum((z0[:, :expert_dim] - z0_hat[:, :expert_dim]) ** 2, axis=1)
        err_x = _masked_mean_sq_err(x_test, x_hat, mask_test, axes=(0, 2))
        z_samples = jnp.moveaxis(z_mc[:, :, :expert_dim], 0, -1)
        crps_z0 = jnp.mean(crps_ensemble(z0[:, :expert_dim], z_samples), axis=1)
        x_samples = jnp.moveaxis(x_mc[:, t0:], 0, -1)
        crps_x = jnp.mean(crps_ensemble(x_test, x_samples), axis=(0, 2))
        return err_z0, err_x, crps_z0, crps_x

    batch_spec = P(None, data_axis, None)
    out_spec = (P(data_axis),) * 4

    def chunk(params, batch, key):
        # Same key schedule as _chunk_forward: one point key, mc_itr MC keys.
        key, k_point = jax.random.split(key)
        mc_keys = jax.random.split(key, mc_itr)  # (MC, 2), sharded over mc
        batch_specs = {k: batch_spec for k in batch}
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), batch_specs, P(), P(mc_axis)),
            out_specs=out_spec,
            check_vma=False,
        )(params, batch, k_point, mc_keys)

    return jax.jit(chunk)


def evaluate_sharded(
    params,
    model: VIModel,
    data_generator,
    batch_size: int,
    t0: int,
    mesh: Mesh,
    mc_itr: int = 50,
    key=None,
    verbose: bool = True,
):
    """Mesh-parallel twin of eval.metrics.evaluate: same chunking protocol
    and stdout CSV contract, with each chunk sharded (patients x MC)."""
    from ..eval.metrics import bootstrap_rmse

    if key is None:
        key = jax.random.PRNGKey(0)
    n_data = mesh.shape["data"]
    if batch_size % n_data:
        raise ValueError(
            f"batch_size {batch_size} not divisible by the data mesh axis ({n_data}); "
            "sharded eval chunks must split evenly over devices")
    expert_dim = data_generator.expert_dim
    chunk_fn = make_sharded_eval_chunk(model, mesh, t0, mc_itr, expert_dim)
    data_sharding = jax.sharding.NamedSharding(mesh, P(None, "data", None))

    tots = [[], [], [], []]
    for chunk in range(data_generator.test_size // batch_size):
        batch = data_generator.get_split("test", batch_size, chunk)
        batch = {k: jax.device_put(v, data_sharding) for k, v in batch.items()}
        key, k = jax.random.split(key)
        for t, o in zip(tots, chunk_fn(params, batch, k)):
            t.append(np.asarray(o))

    err_z0, err_x, crps_z0, crps_x = (np.concatenate(t) for t in tots)
    rmse_z0 = float(np.sqrt(np.mean(err_z0)))
    rmse_z0_sd = bootstrap_rmse(err_z0)
    cprs_z0 = float(np.mean(crps_z0))
    err_x = err_x[~np.isnan(err_x)]
    rmse_x = float(np.sqrt(np.mean(err_x)))
    rmse_x_sd = bootstrap_rmse(err_x)
    cprs_x = float(np.mean(crps_x))

    if verbose:
        print("rmse_z0,{:.4f},{:.4f}".format(rmse_z0, rmse_z0_sd))
        print("rmse_x,{:.4f},{:.4f}".format(rmse_x, rmse_x_sd))
        print("cprs_z0,{:.4f},{:.4f}".format(cprs_z0, float(np.std(crps_z0) / np.sqrt(len(crps_z0)))))
        print("cprs_x,{:.4f},{:.4f}".format(cprs_x, float(np.std(crps_x) / np.sqrt(len(crps_x)))))

    return rmse_z0, rmse_z0_sd, cprs_z0, rmse_x, rmse_x_sd, cprs_x
