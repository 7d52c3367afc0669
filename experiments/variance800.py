"""Root-cause instrumentation for the 800-row seed-variance asymmetry.

Round-3 finding (results/ref_seed_spread.md): under the identical ELBO
selection rule at sample=800, the reference code's three seeds land within
SD 0.007 of each other (0.8506/0.8340/0.8446) while ours span 0.63-0.95
(SD 0.134 per-sample, 0.066 lockstep). This experiment measures WHY, per
the round-3 verdict's "near-tie" hypothesis: if many checkpoints along a
training run have validation ELBOs within measurement noise of the best
one but very different forecast RMSEs, then the ELBO rule is a coin flip
among them and the seed-to-seed spread is selection tie-breaking, not
optimizer instability.

For each seed in {666, 123, 42} it trains hybrid sample=800 under the
reference protocol (batch 10, niters 400, test_freq 10, early_stop 10,
restart 3 — experiments/parity_elbo.sh) and records AT EVERY VALIDATION:

  * val_elbo        — the loop's own selection criterion (sum of val chunks)
  * test_fmse       — forecast masked MSE at t0=5 on a fixed 500-patient
                      test chunk (sqrt = the headline rmse_x, up to the
                      bootstrap's chunking)

plus, for the checkpoint the ELBO rule selects, the val-ELBO re-measured
with 20 fresh MC keys — the measurement noise that defines "near-tie".

Output: results/variance800_s{seed}.jsonl (one row per validation) and a
summary table printed at the end (committed as results/variance800.md).

Reference protocol mirrored: training_utils.py:8-97 (per-iteration Adam,
full-val ELBO every test_freq, cross-restart best), run_simulation.py:209
(shuffle=False).
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridode.cli import common
from hybridode.data import SyntheticCohort
from hybridode.inference import init_vi, loss_fn, make_optimizer
from hybridode.inference.elbo import forecast_loss
from hybridode.utils.hostrng import host_key, host_randint, host_split

BATCH = 10
NITERS = 400
TEST_FREQ = 10
EARLY_STOP = 10
RESTARTS = 3
T0 = 5


def main():
    common.enable_compile_cache()
    train_pkl = os.environ.get("V800_TRAIN", "data/datafile_dose_exp.pkl")
    test_pkl = os.environ.get("V800_TEST", "data/datafile_dose_exp_test.pkl")
    seeds = [int(s) for s in os.environ.get("V800_SEEDS", "666 123 42").split()]

    dg = SyntheticCohort.load(train_pkl)
    dg.set_train_size(800)
    dg_test = SyntheticCohort.load(test_pkl)
    test_chunk = dg_test.get_split("test", 500, 0)

    model = common.build_sim_model("hybrid", common.resolve_data_config(None, 800), elbo=True)
    optimizer_holder = {}

    @jax.jit
    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, model, batch, key)
        updates, opt_state = optimizer_holder["opt"].update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def val_elbo_chunk(params, batch, key):
        return loss_fn(params, model, batch, key)

    @jax.jit
    def fmse(params, batch):
        return forecast_loss(params, model, batch, T0)

    val_chunks = max(1, dg.val_size // BATCH)
    train_chunk = max(1, dg.train_size // BATCH)

    for seed in seeds:
        out_path = f"results/variance800_s{seed}.jsonl"
        rows = []
        key = host_key(seed)
        best_od, best_rec, best_params = 1e9, None, None
        for restart in range(RESTARTS):
            key, k_init, k_train = host_split(key, 3)
            params = init_vi(k_init, model)
            optimizer_holder["opt"] = make_optimizer(0.01, params)
            opt_state = optimizer_holder["opt"].init(params)
            k = k_train
            rng = np.random.RandomState(host_randint(k, 0, 2**31 - 1))
            best_run, counter = 1e9, 0
            for itr in range(1, NITERS + 1):
                batch = dg.get_split("train", BATCH, itr % train_chunk)
                k, k_step = jax.random.split(k)
                params, opt_state, loss = train_step(params, opt_state, batch, k_step)
                if not np.isfinite(float(loss)):
                    print(f"seed {seed} restart {restart}: non-finite loss at iter {itr}")
                    break
                if itr % TEST_FREQ == 0:
                    total = 0.0
                    for c in range(val_chunks):
                        vb = dg.get_split("val", BATCH, c)
                        k, k_val = jax.random.split(k)
                        cl = float(val_elbo_chunk(params, vb, k_val))
                        total += cl if np.isfinite(cl) else 1e9
                    t_mse = float(fmse(params, test_chunk))
                    rec = dict(seed=seed, restart=restart, itr=itr,
                               val_elbo=total, train_loss=float(loss),
                               test_rmse=float(np.sqrt(t_mse)))
                    rows.append(rec)
                    if total < best_run:
                        best_run, counter = total, 0
                    else:
                        counter += 1
                    if total < best_od:
                        best_od, best_rec, best_params = total, rec, params
                    if counter >= EARLY_STOP:
                        break

        # re-measure the SELECTED checkpoint's val ELBO with fresh MC keys ->
        # the criterion's own measurement noise, which defines "near-tie"
        assert best_params is not None, f"seed {seed}: no finite validation ever recorded"
        remeas = []
        for j in range(20):
            tot_j = 0.0
            kk = jax.random.PRNGKey(10_000 + j)
            for c in range(val_chunks):
                vb = dg.get_split("val", BATCH, c)
                kk, k_val = jax.random.split(kk)
                tot_j += float(val_elbo_chunk(best_params, vb, k_val))
            remeas.append(tot_j)
        best_rec = dict(best_rec, val_elbo_remeasured_mean=float(np.mean(remeas)),
                        val_elbo_remeasured_sd=float(np.std(remeas)))
        with open(out_path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps(dict(best=best_rec)) + "\n")
        print(f"seed {seed}: best {best_rec}")

        # near-tie analysis: checkpoints whose val ELBO is within the
        # selected checkpoint's own MC re-measurement noise (2 SD)
        noise = best_rec["val_elbo_remeasured_sd"]
        ties = [r for r in rows if r["val_elbo"] <= best_rec["val_elbo"] + 2 * noise]
        rmses = [r["test_rmse"] for r in ties]
        print(f"seed {seed}: {len(ties)} checkpoints within 2*MC-noise ({noise:.2f}) of the "
              f"selected ELBO; their test RMSE spans [{min(rmses):.4f}, {max(rmses):.4f}]")


if __name__ == "__main__":
    main()
