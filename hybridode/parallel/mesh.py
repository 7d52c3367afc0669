"""Multi-chip data parallelism over a jax.sharding.Mesh.

The reference is single-device (SURVEY.md §2 parallelism statement;
global_config.py:6-8 is its entire device policy). The workload's natural
scaling axis is the patient/batch dimension of the time-major (T, B, D)
tensors (dataloader.py:268-270), so the parallel layer is 1-D batch DP:

* params/opt-state replicated, batch sharded on axis "data";
* gradients reduced with an explicit `psum` inside `shard_map` (riding ICI on
  real hardware) — the one collective this workload meaningfully exercises;
* per-shard RNG decorrelated by folding in the axis index.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference.elbo import VIModel, loss_fn


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device '{axis_name}' mesh but only "
                f"{len(devices)} devices are available")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """(T, B, D) tensors shard on the batch axis."""
    return NamedSharding(mesh, P(None, axis_name, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    sh = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def make_dp_train_step(model: VIModel, optimizer, mesh: Mesh, axis_name: str = "data"):
    """Jitted DP training step: shard_map over the batch axis + psum grads.

    The per-shard loss is sum/B_local; `pmean` over shards therefore equals
    the reference's global-batch loss (sum/B_global) exactly, so DP training
    is step-for-step equivalent to single-device training with the same
    global batch.
    """

    def local_step(params, opt_state, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        def local_loss(p):
            return loss_fn(p, model, batch, key)

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.pmean(loss, axis_name)
        grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batch_spec = P(None, axis_name, None)

    def step(params, opt_state, batch, key):
        batch_specs = {k: batch_spec for k in batch}
        sharded = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), batch_specs, P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return sharded(params, opt_state, batch, key)

    return jax.jit(step)


def make_dp_eval_loss(model: VIModel, mesh: Mesh, axis_name: str = "data"):
    """Replicated-params, sharded-batch validation loss."""

    def local(params, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        return jax.lax.pmean(loss_fn(params, model, batch, key), axis_name)

    batch_spec = P(None, axis_name, None)

    def eval_loss(params, batch, key):
        batch_specs = {k: batch_spec for k in batch}
        return jax.shard_map(
            local, mesh=mesh, in_specs=(P(), batch_specs, P()), out_specs=P(), check_vma=False
        )(params, batch, key)

    return jax.jit(eval_loss)
