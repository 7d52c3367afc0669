#!/usr/bin/env bash
# Observation-window sweep: re-evaluate trained models at t0 in {10, 12}
# (reference Fig6.sh). MODEL_PREFIX selects which trained checkpoints to
# re-evaluate (default: the fig3 sample=800 models; the ELBO parity sweep's
# model/elbo_s666_800_ works too).
set -e
cd "$(dirname "$0")/.."
DATA=${DATA:-data/datafile_dose_exp_test.pkl}
MODEL_PREFIX=${MODEL_PREFIX:-model/800_}
OUT=results/results_t0.txt
mkdir -p results
: > "$OUT"

for T0 in 10 12; do
  for METHOD in neural expert hybrid; do
    LOG=results/run_${METHOD}_t0${T0}.txt
    python -m hybridode.cli.run_simulation --method=$METHOD --sample=800 --eval=y \
      --path=$MODEL_PREFIX --t0=$T0 --data_path=$DATA > "$LOG"
    tail -n 4 "$LOG" >> "$OUT"
  done
done
echo "wrote $OUT"
