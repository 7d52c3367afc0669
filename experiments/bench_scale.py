"""Scaled no-grad decode benchmark: fused MC batches >= 1000.

The training benchmark (bench.py) runs the reference's own tiny workload
(dim-8, B=50) where a TPU chip is latency-bound. This bench measures the
regime the evaluation stage actually creates — the reference's mc_itr=50
posterior decodes over the test cohort (training_utils.py:144-151) fuse into
one (patients x MC) batch — at B in {1k, 4k, 16k}:

* dim-12 cohort: adaptive DOPRI5 per-sample-control (the production eval
  path) and the fixed-step RK4 scan — the steps/sec scaling curve;
* dim-8 cohort: the same two plus the Pallas fused-RK4 trajectory kernel
  (ops/pallas/roche_kernel.py — its lane layout covers D <= 8).

Each forward-only, dispatch-pipelined, one final sync. Writes one JSON line
per (cohort, solver, B) to results/bench_scale.jsonl; PERFORMANCE.md's
roofline note is derived from the printed table.

Run on an otherwise-idle host: `python experiments/bench_scale.py`.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def field_flops(latent_dim: int) -> float:
    """FLOPs per field evaluation per sample: expert PK/PD RHS ~90 flops
    (incl. the |x|^p exp/log pairs) + ml-remainder MLP 2*D*ml_dim."""
    ml_dim = latent_dim - 4
    return 90.0 + 2.0 * latent_dim * ml_dim


def main():
    try:
        from hybridode.utils.cache import host_keyed_cache_dir

        jax.config.update("jax_compilation_cache_dir", host_keyed_cache_dir(os.path.join(REPO, ".jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from hybridode.cli.common import build_sim_model
    from hybridode.config import dim8_config, dim12_config
    from hybridode.fields import doses_from_actions, roche_field
    from hybridode.inference import init_vi
    from hybridode.ops.pallas.roche_kernel import roche_rk4_trajectory_from_pytree
    from hybridode.solvers import odeint_dopri5, odeint_fixed

    out_path = os.path.join(REPO, "results", "bench_scale.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    lines = []

    def timeit(fn, *args, n_iters=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n_iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / n_iters, out

    for cohort, config, with_pallas in (("dim12", dim12_config, False),
                                        ("dim8", dim8_config, True)):
        model = build_sim_model("hybrid", config, elbo=True)
        spec = model.decoder_spec
        params = init_vi(jax.random.PRNGKey(0), model)
        ode_params = params["decoder"]["ode"]
        ts = jnp.asarray(spec.ts)
        T = int(ts.shape[0])
        ffl = field_flops(spec.latent_dim)

        for B in (1000, 4000, 16000):
            rng = np.random.RandomState(1)
            # posterior-regime latents (z ~ 0.01) and one bolus per sample.
            z = jnp.asarray(np.abs(rng.randn(B, spec.latent_dim)) * 0.01 + 1e-3, jnp.float32)
            actions = np.zeros((T, B, 1), np.float32)
            actions[3, :, 0] = rng.uniform(1.0, 10.0, B)
            ctx = doses_from_actions(jnp.asarray(actions), spec.step_size)
            CtxType = type(ctx)

            @jax.jit
            def dopri(z, times, amounts):
                def one(z_i, t_i, a_i):
                    ys, stats = odeint_dopri5(
                        roche_field, z_i, ts, (ode_params, CtxType(times=t_i, amounts=a_i)),
                        rtol=spec.rtol, atol=spec.atol, max_steps=spec.max_steps)
                    return ys, stats.n_accepted, stats.n_steps

                return jax.vmap(one)(z, times, amounts)

            @jax.jit
            def rk4(z, times, amounts):
                def one(z_i, t_i, a_i):
                    return odeint_fixed(roche_field, z_i, ts,
                                        (ode_params, CtxType(times=t_i, amounts=a_i)),
                                        method="rk4", n_substeps=8)

                return jax.vmap(one)(z, times, amounts)

            dt, out = timeit(dopri, z, ctx.times, ctx.amounts)
            n_acc = int(jnp.sum(out[1]))
            n_trial = int(jnp.sum(out[2]))
            rec = {"cohort": cohort, "solver": "dopri5_per_sample", "B": B,
                   "seconds": round(dt, 5),
                   "accepted_steps_per_sec": round(n_acc / dt, 1),
                   "trial_steps_per_sec": round(n_trial / dt, 1),
                   "gflops_per_sec": round(n_trial * (6 * ffl + 60) / dt / 1e9, 3)}
            lines.append(rec)
            print(json.dumps(rec))

            n_steps = (T - 1) * 8 * B
            dt, _ = timeit(rk4, z, ctx.times, ctx.amounts)
            rec = {"cohort": cohort, "solver": "rk4_scan_sub8", "B": B,
                   "seconds": round(dt, 5),
                   "steps_per_sec": round(n_steps / dt, 1),
                   "gflops_per_sec": round(n_steps * 4 * ffl / dt / 1e9, 3)}
            lines.append(rec)
            print(json.dumps(rec))

            if with_pallas:
                try:
                    pal = jax.jit(roche_rk4_trajectory_from_pytree(
                        ode_params, ctx, ts, n_substeps=8))
                    dt, _ = timeit(pal, z)
                    rec = {"cohort": cohort, "solver": "pallas_rk4_fused_sub8", "B": B,
                           "seconds": round(dt, 5),
                           "steps_per_sec": round(n_steps / dt, 1),
                           "gflops_per_sec": round(n_steps * 4 * ffl / dt / 1e9, 3)}
                    lines.append(rec)
                    print(json.dumps(rec))
                except Exception as e:  # pallas path is TPU-only
                    print(f"pallas skipped: {type(e).__name__}: {e}", file=sys.stderr)

    with open(out_path, "w") as f:
        for rec in lines:
            f.write(json.dumps(rec) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
