#!/usr/bin/env bash
# Sample-size sweep: 3 methods x {310, 400, 800} samples + ensemble/residual,
# results summarized from the stdout CSV tail (the reference Fig3.sh contract).
set -e
cd "$(dirname "$0")/.."
DATA=${DATA:-data/datafile_dose_exp.pkl}
RESTART=${RESTART:-3}
OUT=results/results_sample.txt
mkdir -p results model
: > "$OUT"

for SAMPLE in 310 400 800; do
  for METHOD in neural expert hybrid; do
    LOG=results/run_${METHOD}_${SAMPLE}.txt
    python -m hybridode.cli.run_simulation --method=$METHOD --sample=$SAMPLE \
      --path=model/${SAMPLE}_ --restart=$RESTART --data_path=$DATA > "$LOG"
    tail -n 4 "$LOG" >> "$OUT"
  done
  LOG=results/run_residual_${SAMPLE}.txt
  python -m hybridode.cli.run_simulation_residual --sample=$SAMPLE \
    --path=model/${SAMPLE}_ --restart=$RESTART --data_path=$DATA > "$LOG"
  tail -n 4 "$LOG" >> "$OUT"
  LOG=results/run_ensemble_${SAMPLE}.txt
  python -m hybridode.cli.run_simulation_ensemble --sample=$SAMPLE \
    --path=model/${SAMPLE}_ --data_path=$DATA > "$LOG"
  tail -n 4 "$LOG" >> "$OUT"
done
echo "wrote $OUT"
