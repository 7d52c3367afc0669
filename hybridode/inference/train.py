"""Jitted Adam training loop with the reference's restart/early-stop semantics.

Reference: training_utils.py:8-97 (variational_training_loop) and
run_simulation.py:95-145 (restart loop; frozen expert parameters via
optimizer param selection at run_simulation.py:125-131).

TPU-native shape: one jitted `(params, opt_state, batch, key) -> (params,
opt_state, loss)` step; mini-batch indices are drawn on host and gathered on
device; parameter freezing is an `optax.multi_transform` label tree instead
of param-list surgery. Solver failure semantics (reference catches
RuntimeError, training_utils.py:43-47) map to finite-loss gating: a non-finite
training loss breaks the loop, a non-finite validation loss adds 1e9.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import checkpoint as ckpt
from ..utils.hostrng import host_randint
from .elbo import VIModel, loss_fn


def param_labels(params, train_expert: bool = False):
    """Label tree for optax.multi_transform: "train" vs "freeze".

    Sim experiments freeze the 13 expert PK/PD constants (and the ablation
    thetas) — the optimizer there sees only encoder + output head + ml_net
    (run_simulation.py:125-131). Real experiments train everything
    (run_real.py:85).
    """
    labels = jax.tree_util.tree_map(lambda _: "train", params)
    if train_expert:
        return labels
    ode = params.get("decoder", {}).get("ode", {})
    for k in ("expert", "theta_1", "theta_2"):
        if k in ode:
            labels["decoder"]["ode"][k] = jax.tree_util.tree_map(lambda _: "freeze", ode[k])
    return labels


def make_optimizer(lr: float, params, train_expert: bool = False):
    labels = param_labels(params, train_expert)
    return optax.multi_transform({"train": optax.adam(lr), "freeze": optax.set_to_zero()}, labels)


def make_train_step(model: VIModel, optimizer) -> Callable:
    @jax.jit
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, model, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


@functools.lru_cache(maxsize=32)
def _cached_step_and_eval(model: VIModel, lr: float, train_expert: bool, labels_key,
                          val_criterion: str = "elbo", val_t0: int = 5):
    """One jitted (step, eval_loss) pair per (model, lr, freeze-labels): the
    reference's restart loop re-enters the training loop n_restart times
    (run_simulation.py:95) — without this cache each restart would re-trace
    and re-compile the identical program."""
    labels = labels_key.tree
    optimizer = optax.multi_transform({"train": optax.adam(lr), "freeze": optax.set_to_zero()}, labels)
    step = make_train_step(model, optimizer)
    if val_criterion == "forecast":
        from .elbo import forecast_loss

        @jax.jit
        def eval_loss(params, batch, key):
            return forecast_loss(params, model, batch, val_t0)

    else:
        eval_loss = make_eval_loss(model)
    return optimizer, step, eval_loss


class _HashableTree:
    """Hashable wrapper for a labels pytree (structure + leaf strings)."""

    def __init__(self, tree):
        self.tree = tree
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        self._key = (tuple(leaves), treedef)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HashableTree) and self._key == other._key


def make_eval_loss(model: VIModel) -> Callable:
    @jax.jit
    def eval_loss(params, batch, key):
        return loss_fn(params, model, batch, key)

    return eval_loss


def variational_training_loop(
    niters: int,
    data_generator: Any,
    model: VIModel,
    params,
    batch_size: int,
    lr: float,
    test_freq: int,
    key,
    best_on_disk: float = 1e9,
    early_stop: int = 5,
    path: str = "model/",
    shuffle: bool = True,
    train_fold: str = "train",
    train_expert: bool = False,
    verbose: bool = True,
    curve_path: str | None = None,
    events_path: str | None = None,
    val_criterion: str = "elbo",
    val_t0: int = 5,
    dp_devices: int | None = None,
    fused: bool | None = None,
):
    """Mirror of reference training_utils.variational_training_loop.

    Returns (params, best_on_disk, wall_time). Checkpoints to
    path + model.model_name only when validation beats the cross-restart
    best; reloads the best checkpoint before returning.

    `dp_devices`: train data-parallel over a mesh of that many devices
    (shard_map + pmean'd grads, hybridode/parallel/mesh.py) — step-for-step
    equivalent to single-device training with the same global batch. The
    batch size must be divisible by the device count.

    `fused`: run each restart as ONE device program (inference/fused.py);
    defaults on (also for DP), opt out via fused=False or HYBRIDODE_FUSED=0.
    The fused program checkpoints once at end-of-restart instead of on every
    validation improvement — opt out if crash-durability mid-restart matters.
    """
    import os

    dp = dp_devices is not None and dp_devices > 1
    if fused is None:
        # Default to the whole-restart device program (single-device AND DP).
        # Opt out with HYBRIDODE_FUSED=0 — the host loop checkpoints on every
        # validation improvement, so it is the crash-durable choice when a
        # process may die mid-restart (the fused program saves once at end).
        fused = os.environ.get("HYBRIDODE_FUSED", "1") != "0"
    if fused and hasattr(data_generator, "_fold"):
        # Whole-restart device program: one dispatch, one read — immune to
        # the tunnel's D2H dispatch degradation (PERFORMANCE.md round 3).
        # Bit-mirrors this host loop's batch-index and key-split streams;
        # with dp_devices it composes shard_map DP inside the same program.
        from .fused import fused_training_loop

        return fused_training_loop(
            niters=niters, data_generator=data_generator, model=model,
            params=params, batch_size=batch_size, lr=lr, test_freq=test_freq,
            key=key, best_on_disk=best_on_disk, early_stop=early_stop,
            path=path, shuffle=shuffle, train_fold=train_fold,
            train_expert=train_expert, verbose=verbose, curve_path=curve_path,
            events_path=events_path, val_criterion=val_criterion, val_t0=val_t0,
            dp_devices=dp_devices if dp else None)
    if dp:
        from ..parallel import make_dp_eval_loss, make_dp_train_step, make_mesh, replicate, shard_batch

        if batch_size % dp_devices:
            raise ValueError(f"batch_size {batch_size} not divisible by dp_devices {dp_devices}")
        mesh = make_mesh(dp_devices)
        optimizer = make_optimizer(lr, params, train_expert)
        step = make_dp_train_step(model, optimizer, mesh)
        if val_criterion == "forecast":
            from .elbo import forecast_loss

            @jax.jit
            def eval_loss(params, batch, key):
                return forecast_loss(params, model, batch, val_t0)

        else:
            eval_loss = make_dp_eval_loss(model, mesh)

        def to_device(batch):
            return shard_batch(batch, mesh)

        params = replicate(params, mesh)
    else:
        labels = _HashableTree(param_labels(params, train_expert))
        optimizer, step, eval_loss = _cached_step_and_eval(model, lr, train_expert, labels, val_criterion, val_t0)

        def to_device(batch):
            return batch

    opt_state = optimizer.init(params)
    if dp:
        opt_state = replicate(opt_state, mesh)

    best_loss = 1e9
    early_stop_counter = 0
    fold_size = data_generator.train_size if train_fold == "train" else data_generator.val_size
    train_chunk = max(1, fold_size // batch_size)
    val_chunks = max(1, data_generator.val_size // batch_size)

    from ..utils import CSVCurveLogger, JSONLLogger

    curve = CSVCurveLogger(curve_path)
    events = JSONLLogger(events_path)
    rng = np.random.RandomState(host_randint(key, 0, 2**31 - 1))
    start = time.time()

    for itr in range(1, niters + 1):
        if shuffle:
            batch = data_generator.get_mini_batch(train_fold, batch_size, rng)
        else:
            batch = data_generator.get_split(train_fold, batch_size, itr % train_chunk)

        key, k_step = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, to_device(batch), k_step)

        if not np.isfinite(float(loss)):
            if verbose:
                print("non-finite training loss; stopping this restart")
            break

        if itr % test_freq == 0:
            total_loss = 0.0
            for chunk in range(val_chunks):
                vbatch = data_generator.get_split("val", batch_size, chunk)
                key, k_val = jax.random.split(key)
                chunk_loss = float(eval_loss(params, to_device(vbatch), k_val))
                total_loss += chunk_loss if np.isfinite(chunk_loss) else 1e9
            if verbose:
                print("Iter {:04d} | Total Loss {:.6f} | Train Loss {:.6f}".format(itr, total_loss, float(loss)))
            curve.log(itr, total_loss, float(loss))
            events.log("val", itr=itr, val_loss=total_loss, train_loss=float(loss))
            if total_loss < best_loss:
                best_loss = total_loss
                early_stop_counter = 0
            else:
                early_stop_counter += 1

            if total_loss < best_on_disk:
                best_on_disk = total_loss
                ckpt.save_checkpoint(path, model.model_name, params, itr, best_on_disk)

        if early_stop_counter >= early_stop:
            break

    wall = time.time() - start
    events.log("done", wall=wall, best_on_disk=float(best_on_disk))
    curve.close()
    events.close()

    try:
        best_params, _, best_on_disk = ckpt.load_checkpoint(path, model.model_name)
    except FileNotFoundError:
        ckpt.save_checkpoint(path, model.model_name, params, 0, best_on_disk)
        best_params, _, best_on_disk = ckpt.load_checkpoint(path, model.model_name)

    params = jax.tree_util.tree_map(jnp.asarray, best_params)
    if verbose:
        print("Time: {}".format(wall))
        print("Overall best loss: {:.6f}".format(best_on_disk))
    return params, best_on_disk, wall
