#!/usr/bin/env bash
# Full replication driver (reference run_all.sh).
set -e
cd "$(dirname "$0")"
bash create_data.sh
bash fig3.sh
bash run_dim.sh
bash run_noise_level.sh
bash fig6.sh
bash fig7.sh
bash fig9.sh

# Round-2/3 parity + perf evidence (beyond the reference's own run_all):
bash parity_elbo.sh fig3
bash parity_elbo.sh dim
bash parity_elbo.sh noise
bash stepspace_ab.sh
SIDE=ours bash real_headtohead.sh     # SIDE=ref needs the torch queue (.ref_run)
STANDIN=y bash real.sh
bash real_budget.sh                   # niters=300-vs-1500 budget sensitivity
python figures.py --which all
python figures.py --which noise_elbo
python figures.py --which headtohead
python summarize_parity.py > ../results/parity_summary.md
bash summarize_ref.sh
python roofline.py
python bench_scale.py
