"""Fused device-side training loop: one restart = one XLA program.

Reference behavior mirrored: training_utils.py:8-97 (variational_training_loop
— per-iteration Adam step, validation every `test_freq` iters, best-model
checkpointing against a cross-restart best, early stop after `early_stop`
validations without improvement, non-finite-loss abort).

Why fused (TPU-native rationale, PERFORMANCE.md round 3): the chip on this
environment sits behind a tunnel whose first device-to-host transfer
permanently degrades per-call dispatch ~10x — and a host-driven loop must
read the loss to gate/validate, so it trains degraded from iteration 1.
This loop instead runs the ENTIRE restart inside `lax.while_loop`:

  * mini-batch index sequences are pre-drawn on the host with the exact
    same numpy RNG stream as the host loop and gathered on device;
  * the per-iteration key-split sequence mirrors the host loop exactly
    (one split per iteration, plus one per validation chunk on validation
    iterations), so trajectories are bit-matched to the unfused loop;
  * validation totals, the early-stop counter, the best-so-far parameters
    (vs the incoming cross-restart best), the finite-loss gate, and the
    training-curve buffer all live in the while-loop carry;
  * ONE dispatch starts the restart and ONE read collects (final params,
    best params, curve) when it finishes. Checkpoint-to-disk happens once
    at the end iff validation improved on the incoming best — the same
    end-of-run disk state as the reference's save-on-every-improvement
    (which only differs if the process dies mid-restart).

The curve/stdout contract is preserved: `Iter NNNN | Total Loss ... |
Train Loss ...` lines, CSV curve rows, and JSONL events are emitted from
the buffer after the program returns (contents identical, timing deferred).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import io_callback

from . import checkpoint as ckpt
from .elbo import VIModel, forecast_loss, forecast_loss_terms, loss_fn

# --- mid-restart durability flush (opt-in, VERDICT r4 #8) ---------------------
# The fused restart checkpoints once when the program RETURNS; a process
# killed mid-restart loses that restart's best. With flush enabled, the
# window loop additionally streams (best_od, best_params, ...) to the host
# once per validation window via an ordered io_callback, and a host-side
# sink writes the checkpoint every K-th window (only when it improves on
# what's already on disk) — a kill then loses at most K windows. The sink
# is a module slot rather than a program closure so the compiled program
# stays reusable across paths/runs (the lru_cache below keys programs by
# protocol, not by output directory).
_FLUSH_SINK = None
_LAST_FLUSH_SINK = None  # kept for tests/observability


class _FlushSink:
    def __init__(self, path, model_name, every, incoming_best):
        self.path = path
        self.model_name = model_name
        self.every = max(1, int(every))
        self.written_od = float(incoming_best)
        self.calls = 0
        self.writes = 0

    def __call__(self, payload):
        self.calls += 1
        if self.calls % self.every:
            return
        if not bool(payload["improved"]):
            return
        od = float(payload["best_od"])
        if od >= self.written_od:
            return
        params = jax.tree_util.tree_map(np.asarray, payload["best_params"])
        ckpt.save_checkpoint(self.path, self.model_name, params,
                             int(payload["best_itr"]), od)
        self.written_od = od
        self.writes += 1


def _flush_to_sink(payload):
    sink = _FLUSH_SINK
    if sink is not None:
        sink(payload)


def _gather(data, idx):
    return {k: jnp.take(v, idx, axis=1) for k, v in data.items()}


def _fold_geometry(data_generator, batch_size, train_fold):
    """Fold tensors + chunk counts shared by both fused loops."""
    fold = data_generator._fold(train_fold)
    fold_n = fold["measurements"].shape[1]
    fold_size = (data_generator.train_size if train_fold == "train"
                 else data_generator.val_size)
    train_chunk = max(1, fold_size // batch_size)
    val_chunks = max(1, data_generator.val_size // batch_size)
    val_n = data_generator._fold("val")["measurements"].shape[1]
    return fold, fold_n, train_chunk, val_chunks, val_n


def _predraw_train_idx(rng, fold_n, train_chunk, niters, batch_size, shuffle):
    """The host loop's batch-index stream, pre-drawn (identical draws).

    This is THE parity contract between the host, fused, and batched loops —
    shared so a fix to the stream cannot diverge between them.
    """
    if shuffle:
        return np.stack([rng.choice(fold_n, batch_size, replace=False)
                         for _ in range(niters)]).astype(np.int32)
    row = min(batch_size, fold_n)
    chunks = np.stack([np.arange(c * batch_size, c * batch_size + row)
                       for c in range(train_chunk)])
    return chunks[(np.arange(1, niters + 1)) % train_chunk].astype(np.int32)


def _predraw_val_idx(val_n, batch_size, val_chunks):
    vrow = min(batch_size, val_n)
    return np.stack([np.arange(c * batch_size, c * batch_size + vrow)
                     for c in range(val_chunks)]).astype(np.int32)


def _check_dp_divisibility(dp, idx_stack, val_idx):
    """Validate the ACTUAL sharded index widths (not the nominal batch_size —
    the no-shuffle stream is min(batch_size, fold_n) wide)."""
    if idx_stack.shape[-1] % dp:
        raise ValueError(
            f"train mini-batch width {idx_stack.shape[-1]} not divisible by "
            f"dp_devices {dp}")
    if val_idx.shape[-1] % dp:
        raise ValueError(
            f"validation chunk width {val_idx.shape[-1]} not divisible by "
            f"dp_devices {dp}")


def _make_run(model: VIModel, lr: float, labels_key, val_criterion: str,
              val_t0: int, niters: int, test_freq: int, early_stop: int,
              dp_devices: int = 0, flush: bool = False):
    """Build the pure whole-restart function (no jit/sharding applied).

    Signature of the returned ``run``:
    ``run(params, key, data_train, data_val, idx_stack, val_idx,
    best_on_disk0) -> dict``. Reused by three compilation strategies:
    jit (single device), shard_map over a "data" mesh (batch DP), and
    vmap over a leading restart axis (batched multi-restart experiment,
    optionally shard_map'd over a "restart" mesh).
    """
    dp = dp_devices > 1
    axis = "data"
    optimizer = optax.multi_transform(
        {"train": optax.adam(lr), "freeze": optax.set_to_zero()}, labels_key.tree)
    n_vals_cap = max(1, niters // test_freq)

    def fold_axis(key):
        # Mirrors make_dp_train_step/make_dp_eval_loss: per-shard RNG
        # decorrelated by folding in the mesh axis index.
        return jax.random.fold_in(key, jax.lax.axis_index(axis)) if dp else key

    def eval_one(params, batch, key):
        if val_criterion == "forecast":
            if dp:
                num, den = forecast_loss_terms(params, model, batch, val_t0)
                num = jax.lax.psum(num, axis)
                den = jax.lax.psum(den, axis)
                return num / jnp.maximum(den, 1.0)
            return forecast_loss(params, model, batch, val_t0)
        loss = loss_fn(params, model, batch, fold_axis(key))
        # per-shard loss is sum/B_local -> pmean == global sum/B_global
        return jax.lax.pmean(loss, axis) if dp else loss

    # The restart is structured as validation WINDOWS: an outer while_loop
    # over `niters // test_freq` windows, an inner lax.scan of `test_freq`
    # Adam steps, then ONE unconditional chunked validation per window. This
    # is numerically identical to a per-iteration loop with a
    # `cond(itr % test_freq == 0, validate)` — same ops, same order — but
    # contains no lax.cond: under jax.vmap (the batched multi-restart
    # experiment) cond lowers to run-both-branches + select, which would
    # execute the FULL validation on every training iteration. The windowed
    # form pays exactly one validation per test_freq steps in every mode.
    n_windows = niters // test_freq
    n_rem = niters - n_windows * test_freq

    def run(params, key, data_train, data_val, idx_stack, val_idx, best_on_disk0):
        opt_state = optimizer.init(params)
        curve_it = jnp.zeros((n_vals_cap,), jnp.int32)
        curve_val = jnp.zeros((n_vals_cap,), jnp.float32)
        curve_tr = jnp.zeros((n_vals_cap,), jnp.float32)

        def val_total(params, key):
            def chunk(carry_key, vidx):
                carry_key, k_val = jax.random.split(carry_key)
                vbatch = _gather(data_val, vidx)
                cl = eval_one(params, vbatch, k_val)
                return carry_key, jnp.where(jnp.isfinite(cl), cl, 1e9)

            key, losses = jax.lax.scan(chunk, key, val_idx)
            return key, jnp.sum(losses)

        def train_step(carry, itr):
            # Host-loop parity: the step that OBSERVES a non-finite loss
            # still applies its update — this mirrors our own host loop
            # (inference/train.py runs the jitted Adam step, then gates on
            # finiteness), which is the bit-parity target for this program;
            # steps after a dead step freeze. (The reference breaks before
            # optimizer.step() because the exception escapes model.loss.)
            key, params, opt_state, alive, last_loss, last_itr = carry
            batch = _gather(data_train, idx_stack[(itr - 1) % idx_stack.shape[0]])
            key, k_step = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, model, batch, fold_axis(k_step))
            if dp:
                loss = jax.lax.pmean(loss, axis)
                grads = jax.lax.pmean(grads, axis)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            params = jax.tree_util.tree_map(
                lambda n, o: jnp.where(alive, n, o), new_params, params)
            opt_state = jax.tree_util.tree_map(
                lambda n, o: jnp.where(alive, n, o), new_opt, opt_state)
            last_loss = jnp.where(alive, loss, last_loss)
            last_itr = jnp.where(alive, itr, last_itr)
            alive = jnp.logical_and(alive, jnp.isfinite(loss))
            return (key, params, opt_state, alive, last_loss, last_itr), None

        def window_body(c):
            (w, key, params, opt_state, best_run, counter, best_od, best_params,
             best_itr, improved, cit, cval, ctr, n_vals, nf, last_itr) = c
            itrs = (w - 1) * test_freq + jnp.arange(1, test_freq + 1, dtype=jnp.int32)
            (key, params, opt_state, alive, tr_loss, last_itr), _ = jax.lax.scan(
                train_step,
                (key, params, opt_state, jnp.asarray(True), jnp.asarray(0.0, jnp.float32), last_itr),
                itrs)

            # One validation per window; a lane that died mid-window skips it
            # (the host loop never reaches the validation iteration).
            key, total = val_total(params, key)
            itr_end = w * test_freq
            better_run = jnp.logical_and(alive, total < best_run)
            best_run = jnp.where(better_run, total, best_run)
            counter = jnp.where(alive, jnp.where(better_run, 0, counter + 1), counter)
            better_od = jnp.logical_and(alive, total < best_od)
            best_od = jnp.where(better_od, total, best_od)
            best_params = jax.tree_util.tree_map(
                lambda b, p: jnp.where(better_od, p, b), best_params, params)
            best_itr = jnp.where(better_od, itr_end, best_itr)
            improved = jnp.logical_or(improved, better_od)
            iv = w - 1
            cit = cit.at[iv].set(jnp.where(alive, itr_end, cit[iv]))
            cval = cval.at[iv].set(jnp.where(alive, total.astype(jnp.float32), cval[iv]))
            ctr = ctr.at[iv].set(jnp.where(alive, tr_loss.astype(jnp.float32), ctr[iv]))
            n_vals = n_vals + jnp.where(alive, 1, 0)
            nf = jnp.logical_not(alive)
            if flush:
                # Ordered host callback once per window; the host sink
                # decides whether this K-th window writes a checkpoint.
                # Device math is untouched (the payload is read-only), so
                # flush on/off programs are bit-identical (tested).
                io_callback(
                    _flush_to_sink, None,
                    dict(best_od=best_od, best_itr=best_itr,
                         improved=improved, best_params=best_params),
                    ordered=True)
            return (w + 1, key, params, opt_state, best_run, counter, best_od,
                    best_params, best_itr, improved, cit, cval, ctr, n_vals, nf,
                    last_itr)

        def window_cond(c):
            w, counter, nf = c[0], c[5], c[14]
            return jnp.logical_and(
                w <= n_windows,
                jnp.logical_and(counter < early_stop, jnp.logical_not(nf)))

        init = (jnp.asarray(1, jnp.int32), jnp.asarray(key), params, opt_state,
                jnp.asarray(1e9, jnp.float32), jnp.asarray(0, jnp.int32),
                jnp.asarray(best_on_disk0, jnp.float32), params,
                jnp.asarray(0, jnp.int32), jnp.asarray(False),
                curve_it, curve_val, curve_tr, jnp.asarray(0, jnp.int32),
                jnp.asarray(False), jnp.asarray(0, jnp.int32))
        out = jax.lax.while_loop(window_cond, window_body, init)
        (_, key, params, opt_state, _, counter, best_od, best_params, best_itr,
         improved, cit, cval, ctr, n_vals, nf, last_itr) = out

        if n_rem:
            # Trailing iterations past the last validation multiple (the host
            # loop runs them unless early-stopped or dead; they change only
            # final_params, never the checkpointed best).
            running = jnp.logical_and(counter < early_stop, jnp.logical_not(nf))
            itrs = n_windows * test_freq + jnp.arange(1, n_rem + 1, dtype=jnp.int32)
            (key, params, opt_state, alive_tail, _, last_itr), _ = jax.lax.scan(
                train_step,
                (key, params, opt_state, running, jnp.asarray(0.0, jnp.float32), last_itr),
                itrs)
            # alive_tail False because `running` was False is NOT a
            # non-finite stop; only a death while running is.
            nf = jnp.logical_or(nf, jnp.logical_and(running, jnp.logical_not(alive_tail)))

        return dict(final_params=params, best_od=best_od, best_params=best_params,
                    best_itr=best_itr, improved=improved, curve_it=cit,
                    curve_val=cval, curve_tr=ctr, n_vals=n_vals, stop_nf=nf,
                    n_iters=last_itr)

    return run


@functools.lru_cache(maxsize=32)
def _cached_fused_program(model: VIModel, lr: float, labels_key, val_criterion: str,
                          val_t0: int, niters: int, test_freq: int, early_stop: int,
                          n_val_chunks: int, dp_devices: int = 0, flush: bool = False):
    """Compile one whole-restart program per (model, protocol) combination.

    The restart loop re-enters with identical settings; lru_cache keeps the
    jitted program (and its executable) alive across restarts and sweep
    repetitions in the same process.

    ``dp_devices > 1`` composes the whole-restart program with batch data
    parallelism: the ENTIRE while_loop runs inside shard_map over a 1-D
    "data" mesh — folds replicated, mini-batch index columns sharded, grads
    and losses pmean'd exactly like parallel/mesh.py's per-step DP — so
    multi-chip training is still one dispatch per restart (no host-driven
    degraded-dispatch fallback).
    """
    dp = dp_devices > 1
    run = _make_run(model, lr, labels_key, val_criterion, val_t0, niters,
                    test_freq, early_stop, dp_devices, flush=flush)
    axis = "data"

    if not dp:
        return jax.jit(run)

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import make_mesh

    mesh = make_mesh(dp_devices, axis_name=axis)
    # The whole restart runs per-device in lockstep: every while_loop
    # predicate is computed from pmean'd (hence replicated) values, so all
    # shards take identical control-flow paths and the outputs replicate.
    sharded = jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(None, axis), P(None, axis), P()),
        out_specs=P(), check_vma=False)
    return jax.jit(sharded)


@functools.lru_cache(maxsize=32)
def _cached_experiment_program(model: VIModel, lr: float, labels_key, val_criterion: str,
                               val_t0: int, niters: int, test_freq: int, early_stop: int,
                               n_restart: int, restart_devices: int = 0,
                               dp_devices: int = 0):
    """Compile the ENTIRE multi-restart experiment as one batched program.

    Restarts are independent until the final cross-restart argmin (the
    reference's best-on-disk threading, run_simulation.py:95-145, selects
    the same checkpoint), so instead of 5 sequential whole-restart
    dispatches the restart axis becomes a *batch axis*:

      * ``vmap`` of the whole-restart ``while_loop`` — JAX batches the loop
        by running until every lane's predicate is false and ``select``-ing
        finished lanes' carries, which is exactly per-restart early stop
        with frozen state;
      * with ``restart_devices > 1`` the vmapped program is additionally
        ``shard_map``'d over a 1-D "restart" mesh — each chip trains its
        own restarts with ZERO collectives (trip counts may diverge per
        shard; no communication happens inside the loop), the only
        cross-chip interaction being the host-side argmin at the end.

    This is restart-level parallelism the reference cannot express: its
    restart loop is inherently sequential host code.

    ``dp_devices > 1`` composes BOTH axes on a 2-D (restart x data) device
    mesh: each restart lane is itself data-parallel — mini-batch index
    columns shard over the "data" axis with grads/losses pmean'd inside the
    lane (exactly the fused-DP layout), while lanes shard over "restart"
    with zero cross-lane collectives. An n_restart x n_dp experiment then
    costs one data-parallel restart's wall-clock on n_restart*n_dp chips.
    """
    dp = dp_devices > 1
    run = _make_run(model, lr, labels_key, val_criterion, val_t0, niters,
                    test_freq, early_stop, dp_devices)
    batched = jax.vmap(run, in_axes=(0, 0, None, None, 0, None, None))
    if restart_devices > 1 or dp:
        from jax.sharding import PartitionSpec as P

        from ..parallel.eval import make_mesh_2d

        r, d = max(1, restart_devices), max(1, dp_devices)
        mesh = make_mesh_2d(r, d, axis_names=("restart", "data"))
        # idx columns shard over "data" within each lane's rows; folds
        # replicated; per-lane while_loop predicates derive from pmean'd
        # values, so all "data" shards of a lane take identical paths.
        batched = jax.shard_map(
            batched, mesh=mesh,
            in_specs=(P("restart"), P("restart"), P(), P(),
                      P("restart", None, "data") if dp else P("restart"),
                      P(None, "data") if dp else P(), P()),
            out_specs=P("restart"), check_vma=False)
    return jax.jit(batched)


def fused_experiment_loop(
    niters, data_generator, model, restart_keys, batch_size, lr, test_freq,
    best_on_disk=1e9, early_stop=5, path="model/", shuffle=True,
    train_fold="train", train_expert=False, verbose=True, curve_path=None,
    events_path=None, val_criterion="elbo", val_t0=5, restart_devices=None,
    dp_devices=None,
):
    """Run the whole n-restart experiment as ONE batched device program.

    ``restart_keys``: list of ``(k_init, k_train)`` pairs, one per restart,
    drawn with the same ``host_split`` chain as the sequential CLI loop
    (cli/run_simulation.py) so initializations and batch-index streams are
    identical draw-for-draw. Selection semantics match the sequential
    best-on-disk threading: each lane tracks its own best validation loss;
    the cross-restart winner is the argmin (first occurrence on ties, like
    the host loop's strict-improvement rule), checkpointed once at the end.

    ``restart_devices``: shard the restart axis over that many devices
    (must divide ``len(restart_keys)``); each device trains its share of
    restarts with no collectives. ``dp_devices``: additionally make each
    lane data-parallel over a second mesh axis (2-D restart x data mesh;
    batch and validation chunk sizes must divide it).

    Returns ``(params, best_on_disk, wall)`` like the sequential loop after
    its final restart.
    """
    from ..utils import CSVCurveLogger, JSONLLogger
    from ..utils.hostrng import host_randint
    from .elbo import init_vi
    from .train import _HashableTree, param_labels

    n_restart = len(restart_keys)
    rd = int(restart_devices) if restart_devices else 0
    if rd > 1 and n_restart % rd:
        raise ValueError(f"n_restart {n_restart} not divisible by restart_devices {rd}")
    dp = int(dp_devices) if dp_devices else 0

    fold, fold_n, train_chunk, val_chunks, val_n = _fold_geometry(
        data_generator, batch_size, train_fold)

    start = time.time()

    # Per-restart init + the exact host RNG batch-index stream per lane.
    params_list, idx_list, tkeys = [], [], []
    for k_init, k_train in restart_keys:
        params_list.append(init_vi(k_init, model))
        rng = np.random.RandomState(host_randint(k_train, 0, 2**31 - 1))
        idx_list.append(_predraw_train_idx(
            rng, fold_n, train_chunk, niters, batch_size, shuffle))
        tkeys.append(np.asarray(k_train))
    params_st = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)
    idx_st = np.stack(idx_list)
    keys_st = np.stack(tkeys)
    val_idx = _predraw_val_idx(val_n, batch_size, val_chunks)
    if dp > 1:
        _check_dp_divisibility(dp, idx_st, val_idx)

    labels = _HashableTree(param_labels(params_list[0], train_expert))
    program = _cached_experiment_program(
        model, float(lr), labels, val_criterion, int(val_t0), int(niters),
        int(test_freq), int(early_stop), n_restart, rd, dp)
    # Each lane tracks its own best from 1e9; the cross-restart comparison
    # (the sequential loop's best_on_disk threading) happens at selection.
    out = program(params_st, keys_st, fold, data_generator._fold("val"),
                  idx_st, val_idx, 1e9)
    out = {k: np.asarray(v) for k, v in out.items() if not isinstance(v, dict)} | {
        k: v for k, v in out.items() if isinstance(v, dict)}

    wall = time.time() - start

    # Replay the sequential loops' logging contract restart-by-restart.
    # Curve CSV keeps the LAST restart only (the sequential CLI re-opens the
    # file per restart, so the final restart's curve is what survives).
    events = JSONLLogger(events_path)
    best_per = np.asarray(out["best_od"])
    for r in range(n_restart):
        n_vals = int(out["n_vals"][r])
        for i in range(n_vals):
            it = int(out["curve_it"][r][i])
            tv, tr = float(out["curve_val"][r][i]), float(out["curve_tr"][r][i])
            if verbose:
                print("Iter {:04d} | Total Loss {:.6f} | Train Loss {:.6f}".format(it, tv, tr))
            events.log("val", restart=r, itr=it, val_loss=tv, train_loss=tr)
        if bool(out["stop_nf"][r]) and verbose:
            print("non-finite training loss; stopping this restart")
    if curve_path:
        curve = CSVCurveLogger(curve_path)
        r_last = n_restart - 1
        for i in range(int(out["n_vals"][r_last])):
            curve.log(int(out["curve_it"][r_last][i]),
                      float(out["curve_val"][r_last][i]),
                      float(out["curve_tr"][r_last][i]))
        curve.close()

    r_star = int(np.argmin(best_per))
    if not bool(out["improved"][0]):
        # Lane 0 never validated finitely: the sequential chain's
        # end-of-restart load would have surfaced a PRE-EXISTING checkpoint
        # at `path` and threaded its loss as later restarts' save threshold
        # (when lane 0 improves, the sequential chain saves over the
        # pre-existing file before ever reading it — same as the plain
        # comparison below).
        try:
            _, _, disk_best = ckpt.load_checkpoint(path, model.model_name)
            best_on_disk = min(best_on_disk, float(disk_best))
        except FileNotFoundError:
            pass
    if bool(out["improved"][r_star]) and float(best_per[r_star]) < best_on_disk:
        best_on_disk = float(best_per[r_star])
        best_params = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[r_star], out["best_params"])
        ckpt.save_checkpoint(path, model.model_name, best_params,
                             int(out["best_itr"][r_star]), best_on_disk)
    events.log("done", wall=wall, best_on_disk=float(best_on_disk))
    events.close()

    try:
        best_params, _, best_on_disk = ckpt.load_checkpoint(path, model.model_name)
    except FileNotFoundError:
        # No restart ever validated finitely: the sequential loop would have
        # saved restart 0's final state at itr 0 as the fallback.
        fallback = jax.tree_util.tree_map(lambda x: np.asarray(x)[0], out["final_params"])
        ckpt.save_checkpoint(path, model.model_name, fallback, 0, best_on_disk)
        best_params, _, best_on_disk = ckpt.load_checkpoint(path, model.model_name)

    params = jax.tree_util.tree_map(jnp.asarray, best_params)
    if verbose:
        print("Time: {}".format(wall))
        print("Overall best loss: {:.6f}".format(best_on_disk))
    return params, best_on_disk, wall


def fused_training_loop(
    niters, data_generator, model, params, batch_size, lr, test_freq, key,
    best_on_disk=1e9, early_stop=5, path="model/", shuffle=True,
    train_fold="train", train_expert=False, verbose=True, curve_path=None,
    events_path=None, val_criterion="elbo", val_t0=5, dp_devices=None,
    flush_every=None,
):
    """Drop-in replacement for variational_training_loop.

    Pre-draws the host RNG's batch-index stream, runs the restart as one
    device program, then replays logging/checkpointing from the returned
    buffers. Returns (params, best_on_disk, wall) like the host loop.

    ``dp_devices``: run the restart data-parallel over that many devices
    (mesh + shard_map inside the one compiled program). Batch and validation
    chunk sizes must divide the device count.

    Crash-durability note (vs the host loop): the best-so-far checkpoint is
    written ONCE when the restart program returns, not on every validation
    improvement — a process killed mid-restart loses that restart's best.
    Set HYBRIDODE_FUSED=0 (or pass fused=False) to keep the host loop's
    save-on-every-improvement behavior, or set ``flush_every=K`` (env
    HYBRIDODE_FLUSH_EVERY=K) to additionally stream the best-so-far to the
    host once per validation window and write it to disk every K-th window
    when it improves on what's already there — a kill then loses at most K
    windows of progress. The flush uses an ordered io_callback whose payload
    is read-only, so device math (and hence the returned params) is
    bit-identical with flush on or off; it costs one D2H transfer per window
    and is therefore opt-in (single-restart programs only; the vmapped
    experiment loop can't order host callbacks across lanes).
    """
    from ..utils import CSVCurveLogger, JSONLLogger
    from ..utils.hostrng import host_randint
    from .train import _HashableTree, param_labels

    labels = _HashableTree(param_labels(params, train_expert))

    fold, fold_n, train_chunk, val_chunks, val_n = _fold_geometry(
        data_generator, batch_size, train_fold)

    rng = np.random.RandomState(host_randint(key, 0, 2**31 - 1))
    start = time.time()

    # Host-side batch-index stream, identical to the host loop's draws.
    idx_stack = _predraw_train_idx(rng, fold_n, train_chunk, niters, batch_size, shuffle)
    val_idx = _predraw_val_idx(val_n, batch_size, val_chunks)

    dp = int(dp_devices) if dp_devices else 0
    if dp > 1:
        _check_dp_divisibility(dp, idx_stack, val_idx)

    import os

    global _FLUSH_SINK, _LAST_FLUSH_SINK
    if flush_every is None:
        flush_every = int(os.environ.get("HYBRIDODE_FLUSH_EVERY", "0"))
    flush_every = int(flush_every or 0)

    program = _cached_fused_program(
        model, float(lr), labels, val_criterion, int(val_t0), int(niters),
        int(test_freq), int(early_stop), int(val_chunks), dp,
        flush=flush_every > 0)
    if flush_every > 0:
        _FLUSH_SINK = _LAST_FLUSH_SINK = _FlushSink(
            path, model.model_name, flush_every, best_on_disk)
    try:
        out = program(params, np.asarray(key), fold, data_generator._fold("val"),
                      idx_stack, val_idx, float(best_on_disk))
        out = {k: np.asarray(v) if not isinstance(v, dict) else v for k, v in out.items()}
    finally:
        _FLUSH_SINK = None

    wall = time.time() - start

    # Replay the host loop's logging contract from the device buffers.
    curve = CSVCurveLogger(curve_path)
    events = JSONLLogger(events_path)
    n_vals = int(out["n_vals"])
    for i in range(n_vals):
        it, tv, tr = int(out["curve_it"][i]), float(out["curve_val"][i]), float(out["curve_tr"][i])
        if verbose:
            print("Iter {:04d} | Total Loss {:.6f} | Train Loss {:.6f}".format(it, tv, tr))
        curve.log(it, tv, tr)
        events.log("val", itr=it, val_loss=tv, train_loss=tr)
    if bool(out["stop_nf"]) and verbose:
        print("non-finite training loss; stopping this restart")

    if bool(out["improved"]):
        best_on_disk = float(out["best_od"])
        best_params = jax.tree_util.tree_map(np.asarray, out["best_params"])
        ckpt.save_checkpoint(path, model.model_name, best_params, int(out["best_itr"]), best_on_disk)

    events.log("done", wall=wall, best_on_disk=float(best_on_disk))
    curve.close()
    events.close()

    try:
        best_params, _, best_on_disk = ckpt.load_checkpoint(path, model.model_name)
    except FileNotFoundError:
        ckpt.save_checkpoint(path, model.model_name, out["final_params"], 0, best_on_disk)
        best_params, _, best_on_disk = ckpt.load_checkpoint(path, model.model_name)

    params = jax.tree_util.tree_map(jnp.asarray, best_params)
    if verbose:
        print("Time: {}".format(wall))
        print("Overall best loss: {:.6f}".format(best_on_disk))
    return params, best_on_disk, wall
