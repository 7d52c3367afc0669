"""Diagnose the TPU-tunnel dispatch pathology: one D2H read degrades dispatch.

On this environment the TPU chip is reached through a tunnel (platform
"axon"). Measurement (MODE cells below, results in PERFORMANCE.md round 3):
the very first device-to-host transfer of *any* kind — a `float(loss)` of a
pending value, a read after `jax.block_until_ready` + sleep (value already
finished), or an `np.asarray` of a parameter array — permanently flips the
runtime out of its pipelined-dispatch regime: an epoch of 20 jitted train
steps goes from ~0.015 s to ~0.13-0.25 s (≈7-13x), and it never recovers
within the process (not with further steps, not with `jax.clear_caches()`).

Safe operations (no degradation): host-to-device transfers (feeding numpy
batches), `jax.block_until_ready` syncs with no transfer, and compiling +
running additional programs whose results are never read back
(MODE=newprog_nod2h).

Consequences for the framework (both fixed in round 3):
  * bench.py's BENCH_CALIBRATE path read probe stats before the timed
    window — the "calibrate" rows of results/bench_ab.jsonl measured the
    poisoned regime (0.11 s/epoch), not the calibrated budget. Round 2's
    "adjoint is ~18x slower" claim came from the same artifact
    (calibrate_adjoint at 2.7 s/epoch); the clean adjoint measurement is
    within ~25% of the bounded-scan integrator.
  * The training loop read `float(loss)` every iteration (finite-loss
    gate), so every production CLI run trained in the degraded regime from
    iteration 1. Fix: the fused device-side training loop
    (hybridode/inference/fused.py) — one dispatch and one read per restart.

Usage: MODE={none,probe256,probe512,tinyjit,encodejit,d2h_only,
             newprog_nod2h,ready_read,devget_array} python experiments/tunnel_pathology.py

Each run times the same compiled train step before and after the MODE
perturbation (3 windows of 3 epochs, sync-once protocol).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from hybridode.cli.common import build_sim_model, enable_compile_cache
from hybridode.config import dim8_config, RocheConfig
from hybridode.data.synthetic import SyntheticCohort
from hybridode.inference import init_vi, make_optimizer, make_train_step
from hybridode.fields import doses_from_actions, roche_field
from hybridode.inference.elbo import encode
from hybridode.models import priors
from hybridode.solvers import odeint_dopri5

enable_compile_cache()
MODE = os.environ.get("MODE", "d2h_only")

dg = SyntheticCohort(
    n_sample=1100, obs_dim=40, t_max=14, step_size=1, roche_config=RocheConfig(kel=1),
    output_sigma=0.2, dose_max=10, latent_dim=8, sparsity=0.5, output_sparsity=1 - 0.375,
    p_remove=0.5, val_size=50, test_size=50, rng=np.random.RandomState(666),
)
dg.generate_data()
dg.split_sample()

model = build_sim_model("hybrid", dim8_config, elbo=True, max_steps=256)
params = init_vi(jax.random.PRNGKey(0), model)
optimizer = make_optimizer(0.01, params)
opt_state = optimizer.init(params)
rng = np.random.RandomState(0)
key = jax.random.PRNGKey(1)
step = make_train_step(model, optimizer)


def timed(tag, windows=3):
    global params, opt_state, key
    for _ in range(20):  # warmup/compile outside the windows
        batch = dg.get_mini_batch("train", 50, rng)
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, k)
    jax.block_until_ready(loss)
    times = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(3 * 20):
            batch = dg.get_mini_batch("train", 50, rng)
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, batch, k)
        jax.block_until_ready(loss)
        times.append((time.time() - t0) / 3)
    print(f"{tag}: {[round(t, 4) for t in times]} s/epoch", flush=True)


def make_probe(n):
    spec = model.decoder_spec
    ts = jnp.asarray(spec.ts)

    @jax.jit
    def probe(params, batch, key):
        mu, log_var = encode(params, model, batch["measurements"], batch["actions"], batch["masks"])
        z = priors.gaussian_reparameterize(key, mu, log_var)
        ctx = doses_from_actions(batch["actions"], spec.step_size)
        CtxType = type(ctx)

        def solve_one(z_i, times_i, amounts_i):
            _, stats = odeint_dopri5(
                roche_field, z_i, ts,
                (params["decoder"]["ode"], CtxType(times=times_i, amounts=amounts_i)),
                rtol=spec.rtol, atol=spec.atol, max_steps=n,
            )
            return stats.n_steps, stats.n_accepted, stats.success

        a, b, c = jax.vmap(solve_one)(z, ctx.times, ctx.amounts)
        return jnp.sum(a), jnp.sum(b), jnp.max(a), jnp.max(b), jnp.all(c)

    return probe


timed("before")
pbatch = dg.get_mini_batch("train", 50, np.random.RandomState(2))

if MODE in ("probe512", "probe256"):
    res = [int(x) for x in make_probe(int(MODE[5:]))(params, pbatch, jax.random.PRNGKey(9))]
    print(f"{MODE}:", res, flush=True)
elif MODE == "tinyjit":
    f = jax.jit(lambda x: x * 2.0)
    print("tinyjit:", float(f(jnp.ones((8, 8))).sum()), flush=True)
elif MODE == "encodejit":
    @jax.jit
    def enc(params, batch):
        mu, log_var = encode(params, model, batch["measurements"], batch["actions"], batch["masks"])
        return jnp.sum(mu), jnp.sum(log_var)

    print("encodejit:", [float(x) for x in enc(params, pbatch)], flush=True)
elif MODE == "d2h_only":
    # No new program: read back a scalar produced by the step program itself.
    batch = dg.get_mini_batch("train", 50, rng)
    key, k = jax.random.split(key)
    params, opt_state, loss = step(params, opt_state, batch, k)
    print("d2h_only:", float(loss), flush=True)
elif MODE == "newprog_nod2h":
    # New program, but never read its result back to the host.
    f = jax.jit(lambda x: x * 2.0)
    r = f(jnp.ones((8, 8)))
    jax.block_until_ready(r)
    del r
    print("newprog_nod2h ran", flush=True)
elif MODE == "ready_read":
    # Read a value that already finished on device: the transfer itself is
    # the trigger, not blocking on a pending computation.
    batch = dg.get_mini_batch("train", 50, rng)
    key, k = jax.random.split(key)
    params, opt_state, loss = step(params, opt_state, batch, k)
    jax.block_until_ready(loss)
    time.sleep(0.5)
    print("ready_read:", float(loss), flush=True)
elif MODE == "devget_array":
    batch = dg.get_mini_batch("train", 50, rng)
    key, k = jax.random.split(key)
    params, opt_state, loss = step(params, opt_state, batch, k)
    jax.block_until_ready(params)
    arr = np.asarray(jax.tree_util.tree_leaves(params)[0])
    print("devget_array:", float(arr.sum()), flush=True)
elif MODE == "none":
    print("no perturbation", flush=True)

timed("after")
timed("after+1")
timed("after+2")
