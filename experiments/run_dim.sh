#!/usr/bin/env bash
# dim8 / dim12 sweeps (reference run_dim.sh).
set -e
cd "$(dirname "$0")/.."
RESTART=${RESTART:-3}
OUT=results/results_dim.txt
mkdir -p results model
: > "$OUT"

for DIM in dim8 dim12; do
  DATA=data/datafile_${DIM}.pkl
  for METHOD in neural expert hybrid; do
    LOG=results/run_${METHOD}_${DIM}.txt
    python -m hybridode.cli.run_simulation --method=$METHOD --sample=1100 \
      --path=model/${DIM}_ --restart=$RESTART --data_config=$DIM --data_path=$DATA > "$LOG"
    tail -n 4 "$LOG" >> "$OUT"
  done
  python -m hybridode.cli.run_simulation_residual --sample=1100 --path=model/${DIM}_ \
    --restart=$RESTART --data_config=$DIM --data_path=$DATA > results/run_residual_${DIM}.txt
  tail -n 4 results/run_residual_${DIM}.txt >> "$OUT"
  python -m hybridode.cli.run_simulation_ensemble --sample=100 --path=model/${DIM}_ \
    --data_config=$DIM --data_path=$DATA > results/run_ensemble_${DIM}.txt
  tail -n 4 results/run_ensemble_${DIM}.txt >> "$OUT"
done
echo "wrote $OUT"
