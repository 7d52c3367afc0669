#!/usr/bin/env bash
# Step-space A/B for the hybrid 400/800 ELBO-criterion gap (VALIDATION.md):
# same data, seeds, protocol (batch_size=10, restart=3, niters=400,
# val_criterion=elbo — reference Fig3.sh rules) as the committed per-sample
# runs (results/elbo_hybrid_{400,800}_s*_test.txt), with ONE change:
# --step_control=lockstep, i.e. torchdiffeq's one-controller-per-batch step
# schedule. If the overshoot/seed variance is caused by per-sample controller
# step placement (the only solver-semantics deviation), lockstep removes it;
# if it persists, the cause is elsewhere (init / batch draw order).
#
# Usage: SEEDS="666 123 42" bash experiments/stepspace_ab.sh
set -e
cd "$(dirname "$0")/.."
TRAIN=data/datafile_dose_exp.pkl
TEST=data/datafile_dose_exp_test.pkl
SEEDS=${SEEDS:-666 123 42}
mkdir -p results model

done_log() { [ -f "$1" ] && [ "$(grep -c '^rmse_x\|^rmse_z0\|^cprs' "$1" 2>/dev/null)" -ge 4 ]; }

for SEED in $SEEDS; do
  for SAMPLE in 400 800; do
    P=model/lockstep_s${SEED}_${SAMPLE}_
    ELOG=results/elbo_lockstep_hybrid_${SAMPLE}_s${SEED}_test.txt
    if done_log "$ELOG"; then echo "skip $SAMPLE s$SEED (done)"; continue; fi
    LOG=results/elbo_lockstep_hybrid_${SAMPLE}_s${SEED}.txt
    python -m hybridode.cli.run_simulation --method=hybrid --sample=$SAMPLE \
      --batch_size=10 --restart=3 --seed=$SEED --val_criterion=elbo \
      --step_control=lockstep --path=$P --data_path=$TRAIN > "$LOG"
    python -m hybridode.cli.run_simulation --method=hybrid --sample=$SAMPLE \
      --seed=$SEED --step_control=lockstep --path=$P --data_path=$TEST --eval=y > "$ELOG"
  done
done

OUT=results/stepspace_ab.md
{
  echo "## Step-space A/B: per-sample vs lockstep controller (hybrid, val_criterion=elbo)"
  echo
  echo "| sample | seed | per-sample rmse_x | lockstep rmse_x |"
  echo "|---|---|---|---|"
  for SAMPLE in 400 800; do
    for SEED in $SEEDS; do
      PS=$(grep '^rmse_x' results/elbo_hybrid_${SAMPLE}_s${SEED}_test.txt 2>/dev/null | cut -d, -f2)
      LS=$(grep '^rmse_x' results/elbo_lockstep_hybrid_${SAMPLE}_s${SEED}_test.txt 2>/dev/null | cut -d, -f2)
      echo "| $SAMPLE | $SEED | ${PS:-—} | ${LS:-—} |"
    done
  done
  echo
  echo "Reference committed single-run values: 400 -> 0.625, 800 -> 0.621"
  echo "(/root/reference/results/results_sample.txt:30,50)."
} > "$OUT"
echo "wrote $OUT"
