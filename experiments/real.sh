#!/usr/bin/env bash
# Real-data track: 8 methods x sample sizes (reference real.sh). Requires the
# DDW arrays under data/ (license-restricted) or --standin y stand-ins.
# Resumable: cells with a complete log (4 horizon rmse_x lines) are skipped;
# the CSV is rebuilt from logs at the end.
set -e
cd "$(dirname "$0")/.."
STANDIN=${STANDIN:-n}
SAMPLES=${SAMPLES:-100 250 500 1000}
OUT=results/results_real_sample.csv
mkdir -p results model

done_log() { [ -f "$1" ] && [ "$(grep -c '^rmse_x' "$1" 2>/dev/null)" -ge 4 ]; }

for SAMPLE in $SAMPLES; do
  for METHOD in neural hybrid tlstm gruode 2nd expert; do
    LOG=results/run_real_${METHOD}_${SAMPLE}.txt
    if done_log "$LOG"; then echo "skip real $METHOD $SAMPLE (done)"; continue; fi
    python -m hybridode.cli.run_real --method=$METHOD --sample=$SAMPLE --standin=$STANDIN > "$LOG"
  done
  LOG=results/run_real_ensemble_${SAMPLE}.txt
  if ! done_log "$LOG"; then
    python -m hybridode.cli.run_real_ensemble --sample=$SAMPLE --standin=$STANDIN > "$LOG"
  fi
  LOG=results/run_real_residual_${SAMPLE}.txt
  if ! done_log "$LOG"; then
    python -m hybridode.cli.run_real_residual --sample=$SAMPLE --standin=$STANDIN > "$LOG"
  fi
done

: > "$OUT"
for SAMPLE in $SAMPLES; do
  for METHOD in neural hybrid tlstm gruode 2nd expert ensemble residual; do
    LOG=results/run_real_${METHOD}_${SAMPLE}.txt
    grep '^rmse_x' "$LOG" 2>/dev/null | sed "s/^/${METHOD},${SAMPLE},/" >> "$OUT" || true
  done
done
echo "wrote $OUT"
