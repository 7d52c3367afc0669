#!/usr/bin/env bash
# dim8 / dim12 sweeps (reference run_dim.sh: sample_total = 400 + 800 = 1200
# -> train 100 on the val100/test1000 cohorts; batch 10; hybrid gets
# arg_itr=1000 restart=1; ensemble/residual use sample_cali = 100).
set -e
cd "$(dirname "$0")/.."
OUT=results/results_dim.txt
mkdir -p results model
: > "$OUT"

for DIM in dim8 dim12; do
  DATA=data/datafile_${DIM}.pkl
  for METHOD in neural expert; do
    LOG=results/run_${METHOD}_${DIM}.txt
    python -m hybridode.cli.run_simulation --method=$METHOD --sample=1200 --batch_size=10 \
      --path=model/${DIM}_ --restart=${RESTART:-3} --data_config=$DIM --data_path=$DATA > "$LOG"
    tail -n 4 "$LOG" >> "$OUT"
  done
  LOG=results/run_hybrid_${DIM}.txt
  python -m hybridode.cli.run_simulation --method=hybrid --sample=1200 --batch_size=10 \
    --arg_itr=1000 --restart=1 --path=model/${DIM}_ --data_config=$DIM --data_path=$DATA > "$LOG"
  tail -n 4 "$LOG" >> "$OUT"
  python -m hybridode.cli.run_simulation_residual --sample=100 --path=model/${DIM}_ \
    --restart=${RESTART:-3} --data_config=$DIM --data_path=$DATA > results/run_residual_${DIM}.txt
  tail -n 4 results/run_residual_${DIM}.txt >> "$OUT"
  python -m hybridode.cli.run_simulation_ensemble --sample=100 --path=model/${DIM}_ \
    --data_config=$DIM --data_path=$DATA > results/run_ensemble_${DIM}.txt
  tail -n 4 results/run_ensemble_${DIM}.txt >> "$OUT"
done
echo "wrote $OUT"
