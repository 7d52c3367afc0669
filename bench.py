"""Benchmark: hybrid-LHM training epoch on the dim-8 synthetic cohort.

Protocol mirrors the reference's training regime (run_simulation.py with
--data_config dim8: batch 50, dopri5 rtol=1e-7/atol=1e-8, backprop through
the solver): one epoch = 20 jitted train steps of batch 50 (= one pass over
1000 training samples). Prints ONE JSON line.

vs_baseline: speedup over the torch-CPU reference-equivalent epoch measured
by bench_baseline_torch.py on this machine (stored in BASELINE_TORCH.json).
If no stored baseline exists, vs_baseline is 0.0.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from hybridode.cli.common import build_sim_model
    from hybridode.config import RocheConfig, dim8_config
    from hybridode.data.synthetic import SyntheticCohort
    from hybridode.inference import init_vi, make_optimizer, make_train_step

    # dim-8 cohort, 1000 usable samples (generate_data_dim8.py regime).
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
    step = make_train_step(model, optimizer)

    batch_size = 50
    steps_per_epoch = 20
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)

    def one_epoch(params, opt_state, key):
        for _ in range(steps_per_epoch):
            batch = dg.get_mini_batch("train", batch_size, rng)
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, batch, k)
        jax.block_until_ready(loss)
        return params, opt_state, key, float(loss)

    # Warmup (compile) + 1 epoch to stabilize.
    params, opt_state, key, _ = one_epoch(params, opt_state, key)

    n_epochs = 3
    t0 = time.time()
    for _ in range(n_epochs):
        params, opt_state, key, loss = one_epoch(params, opt_state, key)
    epoch_seconds = (time.time() - t0) / n_epochs

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_TORCH.json")
    vs_baseline = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        vs_baseline = float(base["epoch_seconds"]) / epoch_seconds

    print(json.dumps({
        "metric": "hybrid_lhm_dim8_epoch_wallclock",
        "value": round(epoch_seconds, 4),
        "unit": "s/epoch (20x batch-50 dopri5 train steps)",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
