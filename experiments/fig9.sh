#!/usr/bin/env bash
# Latent-size sweep: encoder_output_dim in {10, 15} (reference Fig9.sh),
# plus LHM vs LHM-NF training-curve logs.
set -e
cd "$(dirname "$0")/.."
DATA=${DATA:-data/datafile_dose_exp.pkl}
RESTART=${RESTART:-3}
OUT=results/results_latent.txt
mkdir -p results model
: > "$OUT"

for DIM in 10 15; do
  LOG=results/run_hybrid_latent${DIM}.txt
  python -m hybridode.cli.run_simulation --method=hybrid --sample=800 \
    --path=model/latent${DIM}_ --restart=$RESTART --encoder_output_dim=$DIM \
    --data_path=$DATA > "$LOG"
  tail -n 4 "$LOG" >> "$OUT"
done

# Training curves (iter, val, train) for Fig9's right panel — written by the
# training loop's CSV curve logger (reference results/exp_lhm.csv format:
# 400 iters, test_freq 10, val column = summed val-ELBO). Both runs use the
# SAME selection criterion (--val_criterion=elbo) so the LHM vs LHM-NF
# comparison is like-for-like and re-running this script reproduces the
# committed CSVs.
python -m hybridode.cli.run_simulation --method=hybrid --sample=800 --path=model/curve_ \
  --restart=1 --arg_itr=400 --batch_size=10 --data_path=$DATA --val_criterion=elbo \
  --curve_path=results/exp_lhm.csv --events_path=results/exp_lhm_events.jsonl \
  > results/run_hybrid_curve.txt
python -m hybridode.cli.run_simulation_flow --sample=800 --path=model/curvef_ \
  --restart=1 --arg_itr=400 --batch_size=10 --data_path=$DATA --val_criterion=elbo \
  --curve_path=results/exp_flow.csv --events_path=results/exp_flow_events.jsonl \
  > results/run_flow_curve.txt
echo "wrote $OUT"
