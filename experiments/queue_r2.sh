#!/usr/bin/env bash
# Round-2 experiment queue: runs after the fig3 ELBO parity sweep finishes.
# Sequential so nothing contends for the single TPU chip / host core.
set -x
cd "$(dirname "$0")/.."

# 1. dim sweep under the reference's elbo criterion (3 seeds)
SEEDS="666 123 42" bash experiments/parity_elbo.sh dim

# 2. real-data stand-in sweep (8 methods x 4 sample sizes)
STANDIN=y bash experiments/real.sh

# 3. fig6 re-evals at t0 in {10,12} (uses model/800_ checkpoints from the
#    round-1 fig3 run; falls back silently if absent)
bash experiments/fig6.sh || true

# 4. fig9 training curves via the curve logger
bash experiments/fig9.sh

# 5. figures
python experiments/figures.py --which all || true

echo "QUEUE_DONE"
