#!/usr/bin/env bash
# Noise sweep 0.4 / 0.8 (reference run_noise_level.sh: sample_total=1200
# -> train 100 on the val100/test1000 noise cohorts, batch 10; plus the flow
# posterior and ensemble/residual with sample_cali=100).
set -e
cd "$(dirname "$0")/.."
OUT=results/results_noise.txt
mkdir -p results model
: > "$OUT"

for NOISE in 0.4 0.8; do
  DATA=data/datafile_dose_noise_${NOISE}.pkl
  for METHOD in neural expert hybrid; do
    LOG=results/run_${METHOD}_noise${NOISE}.txt
    python -m hybridode.cli.run_simulation --method=$METHOD --sample=1200 --batch_size=10 \
      --path=model/noise${NOISE}_ --restart=${RESTART:-3} --data_path=$DATA > "$LOG"
    tail -n 4 "$LOG" >> "$OUT"
  done
  python -m hybridode.cli.run_simulation_flow --sample=1200 --batch_size=10 \
    --path=model/noise${NOISE}_ --restart=${RESTART:-3} --data_path=$DATA > results/run_flow_noise${NOISE}.txt
  tail -n 4 results/run_flow_noise${NOISE}.txt >> "$OUT"
  python -m hybridode.cli.run_simulation_residual --sample=100 --path=model/noise${NOISE}_ \
    --restart=${RESTART:-3} --data_path=$DATA > results/run_residual_noise${NOISE}.txt
  tail -n 4 results/run_residual_noise${NOISE}.txt >> "$OUT"
  python -m hybridode.cli.run_simulation_ensemble --sample=100 --path=model/noise${NOISE}_ \
    --data_path=$DATA > results/run_ensemble_noise${NOISE}.txt
  tail -n 4 results/run_ensemble_noise${NOISE}.txt >> "$OUT"
done
echo "wrote $OUT"
