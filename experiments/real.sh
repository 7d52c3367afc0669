#!/usr/bin/env bash
# Real-data track: 8 methods x sample sizes (reference real.sh). Requires the
# DDW arrays under data/ (license-restricted) or --standin y stand-ins.
set -e
cd "$(dirname "$0")/.."
STANDIN=${STANDIN:-n}
OUT=results/results_real_sample.csv
mkdir -p results model
: > "$OUT"

for SAMPLE in 100 250 500 1000; do
  for METHOD in neural hybrid tlstm gruode 2nd expert; do
    LOG=results/run_real_${METHOD}_${SAMPLE}.txt
    python -m hybridode.cli.run_real --method=$METHOD --sample=$SAMPLE --standin=$STANDIN > "$LOG"
    grep '^rmse_x' "$LOG" | sed "s/^/${METHOD},${SAMPLE},/" >> "$OUT"
  done
  python -m hybridode.cli.run_real_ensemble --sample=$SAMPLE --standin=$STANDIN > results/run_real_ensemble_${SAMPLE}.txt
  grep '^rmse_x' results/run_real_ensemble_${SAMPLE}.txt | sed "s/^/ensemble,${SAMPLE},/" >> "$OUT"
  python -m hybridode.cli.run_real_residual --sample=$SAMPLE --standin=$STANDIN > results/run_real_residual_${SAMPLE}.txt
  grep '^rmse_x' results/run_real_residual_${SAMPLE}.txt | sed "s/^/residual,${SAMPLE},/" >> "$OUT"
done
echo "wrote $OUT"
