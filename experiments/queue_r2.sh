#!/usr/bin/env bash
# Round-2 experiment queue. Sequential so nothing contends for the single
# TPU chip / host core. Each stage is resumable (see parity_elbo.sh/real.sh).
set -x
cd "$(dirname "$0")/.."

# 0. cohorts (idempotent: skip if present)
[ -f data/datafile_dim12.pkl ] || python -m hybridode.cli.create_data --which all --out data/

# 1. fig3 sample sweep under the reference's elbo criterion (3 seeds)
SEEDS="666 123 42" bash experiments/parity_elbo.sh fig3

# 2. dim sweep under the reference's elbo criterion (3 seeds)
SEEDS="666 123 42" bash experiments/parity_elbo.sh dim

# 3. real-data stand-in sweep (8 methods x 4 sample sizes)
STANDIN=y bash experiments/real.sh

# 4. fig6 re-evals at t0 in {10,12} using the seed-666 elbo sample=800 models
MODEL_PREFIX=model/elbo_s666_800_ bash experiments/fig6.sh || true

# 5. fig9 latent sweep + training curves via the curve logger
bash experiments/fig9.sh

# 6. figures + parity summary
python experiments/figures.py --which all || true
python experiments/summarize_parity.py > results/parity_summary.md || true

echo "QUEUE_DONE"
