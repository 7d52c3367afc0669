"""DP scaling artifact: loss-equality + throughput at n_devices in {1,2,4,8}.

Runs the full DP training step (shard_map over the batch axis, pmean'd grads
— hybridode/parallel/mesh.py) on a forced-CPU virtual mesh at each device
count, in a clean subprocess per count. Asserts that the DETERMINISTIC loss
(elbo=False: no per-shard RNG) is identical across device counts — i.e. DP
training is step-for-step equivalent to single-device training with the same
global batch — and records per-step wall-clock / throughput.

Usage:   python experiments/dp_scaling.py            # parent: all counts
         python experiments/dp_scaling.py --child N  # internal

Output:  results/dp_scaling.json + a printed table.

Note: virtual CPU devices share one physical core here, so throughput does
NOT scale (that requires real chips over ICI); the artifact is about
CORRECTNESS of the sharded program at every mesh size, plus the dispatch
overhead trend.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(n_devices: int) -> None:
    sys.path.insert(0, REPO)
    from hybridode.parallel.dryrun import _force_cpu

    _force_cpu(n_devices)

    import jax
    import numpy as np

    from hybridode.cli.common import build_sim_model
    from hybridode.config import dim8_config
    from hybridode.inference import init_vi, make_optimizer
    from hybridode.parallel import make_dp_train_step, make_mesh, replicate, shard_batch
    from hybridode.parallel.dryrun import fake_batch

    # Deterministic loss (elbo=False -> posterior-mean decode, no RNG): the
    # pmean'd DP loss must match bit-for-bit-ish across device counts.
    model = build_sim_model("hybrid", dim8_config, elbo=False, max_steps=192,
                            rtol=1e-4, atol=1e-6)
    params = init_vi(jax.random.PRNGKey(0), model)
    enc = params["encoder"]
    enc["lin"] = {"w": enc["lin"]["w"] * 0.0, "b": enc["lin"]["b"] * 0.0 - 2.3}
    enc["log_var"] = {"w": enc["log_var"]["w"] * 0.0, "b": enc["log_var"]["b"] * 0.0 - 5.0}

    mesh = make_mesh(n_devices)
    optimizer = make_optimizer(0.01, params)
    opt_state = optimizer.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    batch = shard_batch(fake_batch(model, B=16, T=15), mesh)

    step = make_dp_train_step(model, optimizer, mesh)
    losses = []
    key = jax.random.PRNGKey(3)  # unused by the deterministic loss
    # warmup/compile
    p, s, loss = step(params, opt_state, batch, key)
    jax.block_until_ready(loss)

    t0 = time.time()
    p, s = params, opt_state
    n_steps = 5
    for _ in range(n_steps):
        p, s, loss = step(p, s, batch, key)
        losses.append(float(loss))
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / n_steps

    print(json.dumps({
        "n_devices": n_devices,
        "losses": losses,
        "step_ms": round(dt * 1e3, 2),
        "samples_per_sec": round(16 / dt, 1),
    }))


def parent() -> int:
    results = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={n}").strip()
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0:
            print(proc.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"child n={n} failed rc={proc.returncode}")
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        results.append(rec)
        print(f"n={rec['n_devices']}: step={rec['step_ms']}ms "
              f"throughput={rec['samples_per_sec']}/s loss[0]={rec['losses'][0]:.6f}")

    # Loss equality across mesh sizes (f32 reduction-order tolerance).
    ref = results[0]["losses"]
    for rec in results[1:]:
        for a, b in zip(ref, rec["losses"]):
            if abs(a - b) > 1e-4 * max(1.0, abs(a)):
                raise AssertionError(
                    f"DP loss mismatch at n={rec['n_devices']}: {rec['losses']} vs {ref}")
    print("loss equality across n_devices in {1,2,4,8}: OK")

    out = os.path.join(REPO, "results", "dp_scaling.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    note = ("Correctness artifact, not a throughput benchmark: measured on a 1-core host with "
            "8 VIRTUAL CPU devices (xla_force_host_platform_device_count), so samples_per_sec "
            "DEGRADES with device count by construction. The point is the loss columns: "
            "bit-stable loss equality at 1/2/4/8 devices proves the DP sharding is "
            "step-for-step equivalent to single-device training.")
    with open(out, "w") as f:
        json.dump({"results": results, "loss_equal": True, "note": note}, f, indent=1)
    print(f"wrote {out}")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    args = ap.parse_args()
    if args.child is not None:
        child(args.child)
    else:
        sys.exit(parent())


if __name__ == "__main__":
    main()
