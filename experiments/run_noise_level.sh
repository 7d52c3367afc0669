#!/usr/bin/env bash
# Noise sweep 0.4 / 0.8 incl. the flow posterior (reference run_noise_level.sh).
set -e
cd "$(dirname "$0")/.."
RESTART=${RESTART:-3}
OUT=results/results_noise.txt
mkdir -p results model
: > "$OUT"

for NOISE in 0.4 0.8; do
  DATA=data/datafile_dose_noise_${NOISE}.pkl
  for METHOD in neural expert hybrid; do
    LOG=results/run_${METHOD}_noise${NOISE}.txt
    python -m hybridode.cli.run_simulation --method=$METHOD --sample=1100 \
      --path=model/noise${NOISE}_ --restart=$RESTART --data_path=$DATA > "$LOG"
    tail -n 4 "$LOG" >> "$OUT"
  done
  python -m hybridode.cli.run_simulation_flow --sample=1100 --path=model/noise${NOISE}_ \
    --restart=$RESTART --data_path=$DATA > results/run_flow_noise${NOISE}.txt
  tail -n 4 results/run_flow_noise${NOISE}.txt >> "$OUT"
done
echo "wrote $OUT"
