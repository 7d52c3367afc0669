"""Roofline / MFU analysis of the hybrid-LHM training step (VERDICT r2 #7).

For each (latent dim, batch) configuration this measures:

  * FLOPs and HBM bytes per jitted train step from XLA's own cost model
    (`compiled.cost_analysis()` — the compiler's count for the fused
    program it actually runs);
  * wall-clock per step under the sync-once protocol (dispatch all steps,
    one final block; min over windows), on whatever backend is live;
  * achieved GFLOP/s, achieved HBM GB/s, arithmetic intensity, and MFU
    against the chip peaks.

The point this artifact documents (PERFORMANCE.md "utilization story"):
the reference's own workload shapes (latent dim 6-12, batch 10-50) put
microscopic tensors through an adaptive solver — the chip is bound by
per-kernel dispatch/launch latency, not FLOPs or bandwidth, and MFU is
accordingly ~0.01%.  Scaling the batch (the TPU-native remedy: fuse the
whole cohort / all MC draws into one solve) raises solver throughput by
orders of magnitude at identical math. The MC-decode eval path is measured
the same way (the reference's mc_itr=50 decode loop,
training_utils.py:144-151, runs as a single vmap here).

Peaks default to TPU v5e: 197 TFLOP/s bf16 / 98.5 TFLOP/s f32-ish via
3-pass, 819 GB/s HBM (public chip specs). We pin matmul precision to
`highest` framework-wide (PERFORMANCE.md round 1), so the honest MFU
denominator is the f32 figure; both are reported.

Writes results/roofline.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = float(os.environ.get("ROOFLINE_PEAK_BF16_TFLOPS", "197e12"))
PEAK_F32 = float(os.environ.get("ROOFLINE_PEAK_F32_TFLOPS", "98.5e12"))
PEAK_HBM = float(os.environ.get("ROOFLINE_PEAK_HBM_GBPS", "819e9"))


def _cost(compiled):
    """XLA cost analysis: (flops, bytes accessed) for the compiled program."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # backend without a cost model
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return 0.0, 0.0


def _time_step(run, n_steps=20, reps=5):
    """Sync-once timing: dispatch n_steps chained steps, block once."""
    out = run(n_steps)  # warm/compile
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = run(n_steps)
        jax.block_until_ready(out)
        times.append((time.time() - t0) / n_steps)
    return min(times)


def measure_train(dim: int, batch: int):
    from hybridode.cli.common import build_sim_model
    from hybridode.config import dim8_config, dim12_config
    from hybridode.data.synthetic import make_dim_cohort
    from hybridode.inference import init_vi, make_optimizer, make_train_step

    cfg = {8: dim8_config, 12: dim12_config}[dim]
    dg = make_dim_cohort(dim, n_sample=max(batch + 100, 1100) + 100,
                         val_size=50, test_size=50)
    model = build_sim_model("hybrid", cfg, elbo=True)
    params = init_vi(jax.random.PRNGKey(0), model)
    optimizer = make_optimizer(0.01, params)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer)

    rng = np.random.RandomState(0)
    batch_data = dg.get_mini_batch("train", batch, rng)
    key = jax.random.PRNGKey(1)

    lowered = jax.jit(step).lower(params, opt_state, batch_data, key)
    flops, nbytes = _cost(lowered.compile())

    def run(n):
        p, o, k = params, opt_state, key
        loss = None
        for _ in range(n):
            k, ks = jax.random.split(k)
            p, o, loss = step(p, o, batch_data, ks)
        return loss

    sec = _time_step(run)
    return dict(kind="train", dim=dim, batch=batch, flops=flops,
                bytes=nbytes, step_seconds=sec)


def measure_eval(dim: int, batch: int, mc_itr: int):
    from hybridode.cli.common import build_sim_model
    from hybridode.config import dim8_config, dim12_config
    from hybridode.data.synthetic import make_dim_cohort
    from hybridode.eval.metrics import _eval_chunk
    from hybridode.inference import init_vi

    cfg = {8: dim8_config, 12: dim12_config}[dim]
    dg = make_dim_cohort(dim, n_sample=max(batch + 100, 1100) + 100,
                         val_size=50, test_size=50)
    model = build_sim_model("hybrid", cfg, elbo=True)
    params = init_vi(jax.random.PRNGKey(0), model)
    batch_data = dg.get_mini_batch("train", batch, np.random.RandomState(0))
    key = jax.random.PRNGKey(1)
    expert_dim = 4

    lowered = _eval_chunk.lower(params, model, batch_data, 5, mc_itr, expert_dim, key)
    flops, nbytes = _cost(lowered.compile())

    def run(n):
        out = None
        k = key
        for _ in range(n):
            k, ks = jax.random.split(k)
            out = _eval_chunk(params, model, batch_data, 5, mc_itr, expert_dim, ks)
        return out

    sec = _time_step(run, n_steps=5)
    return dict(kind=f"eval_mc{mc_itr}", dim=dim, batch=batch, flops=flops,
                bytes=nbytes, step_seconds=sec)


def enrich(row):
    sec, flops, nbytes = row["step_seconds"], row["flops"], row["bytes"]
    row["achieved_gflops"] = flops / sec / 1e9 if flops else None
    row["achieved_hbm_gbps"] = nbytes / sec / 1e9 if nbytes else None
    row["intensity_flop_per_byte"] = flops / nbytes if nbytes else None
    row["mfu_pct_f32"] = 100 * flops / sec / PEAK_F32 if flops else None
    row["mfu_pct_bf16"] = 100 * flops / sec / PEAK_BF16 if flops else None
    row["hbm_util_pct"] = 100 * nbytes / sec / PEAK_HBM if nbytes else None
    return row


def main():
    smoke = os.environ.get("ROOFLINE_SMOKE", "") == "1"
    train_cfgs = [(8, 10)] if smoke else [(8, 50), (8, 1000), (12, 50), (12, 1000)]
    eval_cfgs = [(8, 10, 5)] if smoke else [(8, 1000, 50), (12, 1000, 50)]
    rows = []
    for dim, batch in train_cfgs:
        print(f"train dim{dim} B={batch} ...", file=sys.stderr)
        rows.append(enrich(measure_train(dim, batch)))
    for dim, batch, mc in eval_cfgs:
        print(f"eval dim{dim} B={batch} mc={mc} ...", file=sys.stderr)
        rows.append(enrich(measure_eval(dim, batch, mc)))

    out = dict(
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
        peaks=dict(bf16_flops=PEAK_BF16, f32_flops=PEAK_F32, hbm_bytes_per_s=PEAK_HBM),
        note=("XLA cost-model FLOPs/bytes for the fused jitted program; "
              "sync-once min-of-5 timing. Matmul precision pinned to highest "
              "(f32 accumulate) framework-wide, so mfu_pct_f32 is the honest "
              "utilization figure."),
        rows=rows,
    )
    os.makedirs("results", exist_ok=True)
    with open("results/roofline.json", "w") as f:
        json.dump(out, f, indent=1)

    print("| kind | dim | batch | GFLOP/step | step ms | achieved GFLOP/s | MFU(f32) | HBM GB/s | HBM util |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print("| {kind} | {dim} | {batch} | {gf:.3f} | {ms:.2f} | {ag:.1f} | {mfu:.4f}% | {bw:.1f} | {hu:.3f}% |".format(
            kind=r["kind"], dim=r["dim"], batch=r["batch"],
            gf=r["flops"] / 1e9, ms=r["step_seconds"] * 1e3,
            ag=r["achieved_gflops"] or 0, mfu=r["mfu_pct_f32"] or 0,
            bw=r["achieved_hbm_gbps"] or 0, hu=r["hbm_util_pct"] or 0))
    print("wrote results/roofline.json", file=sys.stderr)


if __name__ == "__main__":
    main()
