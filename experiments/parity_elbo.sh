#!/usr/bin/env bash
# Protocol-matched parity sweep under the REFERENCE's own model-selection
# rule: --val_criterion=elbo (full-sequence val-ELBO, training_utils.py:56-80),
# restart=3 (reference CLI default, Fig3.sh passes none), batch_size=10,
# niters=400, test_freq=10, early_stop=10, eval-only on the dedicated test
# cohort (reference Fig3.sh:56-67) — across >=3 training seeds.
#
# Resumable: a cell is skipped when its result log already holds the 4-line
# CSV tail (so an interrupted sweep picks up where it left off); the OUT
# summary is rebuilt from the logs at the end.
#
# Usage: SEEDS="666 123 42" bash experiments/parity_elbo.sh [fig3|dim|noise]
set -e
cd "$(dirname "$0")/.."
TRAIN=data/datafile_dose_exp.pkl
TEST=data/datafile_dose_exp_test.pkl
SEEDS=${SEEDS:-666 123 42}
WHICH=${1:-fig3}
mkdir -p results model

done_log() { [ -f "$1" ] && [ "$(grep -c '^rmse_x\|^rmse_z0\|^cprs' "$1" 2>/dev/null)" -ge 4 ]; }

if [ "$WHICH" = "fig3" ]; then
  OUT=results/results_sample_elbo.txt
  for SEED in $SEEDS; do
    for SAMPLE in 310 400 800; do
      for METHOD in neural expert hybrid; do
        P=model/elbo_s${SEED}_${SAMPLE}_
        ELOG=results/elbo_${METHOD}_${SAMPLE}_s${SEED}_test.txt
        if done_log "$ELOG"; then echo "skip $METHOD $SAMPLE s$SEED (done)"; continue; fi
        LOG=results/elbo_${METHOD}_${SAMPLE}_s${SEED}.txt
        python -m hybridode.cli.run_simulation --method=$METHOD --sample=$SAMPLE \
          --batch_size=10 --restart=3 --seed=$SEED --val_criterion=elbo \
          --path=$P --data_path=$TRAIN > "$LOG"
        python -m hybridode.cli.run_simulation --method=$METHOD --sample=$SAMPLE \
          --seed=$SEED --path=$P --data_path=$TEST --eval=y > "$ELOG"
      done
    done
  done
  : > "$OUT"
  for SEED in $SEEDS; do
    for SAMPLE in 310 400 800; do
      for METHOD in neural expert hybrid; do
        ELOG=results/elbo_${METHOD}_${SAMPLE}_s${SEED}_test.txt
        if done_log "$ELOG"; then
          echo "# seed=$SEED sample=$SAMPLE method=$METHOD" >> "$OUT"
          tail -n 4 "$ELOG" >> "$OUT"
        fi
      done
    done
  done
  echo "wrote $OUT"
elif [ "$WHICH" = "noise" ]; then
  # Noise 0.4/0.8 track under the reference run_noise_level.sh protocol
  # (sample_total=1200, batch_size=10, in-pickle test fold, flow included)
  # + the elbo selection criterion.
  OUT=results/results_noise_elbo.txt
  for SEED in $SEEDS; do
    for NL in 0.4 0.8; do
      DATA=data/datafile_dose_noise_${NL}.pkl
      for METHOD in neural expert hybrid; do
        LOG=results/elbo_${METHOD}_noise${NL}_s${SEED}.txt
        if done_log "$LOG"; then echo "skip $METHOD noise$NL s$SEED (done)"; continue; fi
        python -m hybridode.cli.run_simulation --method=$METHOD --sample=1200 \
          --batch_size=10 --restart=3 --seed=$SEED --val_criterion=elbo \
          --path=model/elbo_s${SEED}_noise${NL}_ --data_path=$DATA > "$LOG"
      done
      LOG=results/elbo_flow_noise${NL}_s${SEED}.txt
      if done_log "$LOG"; then echo "skip flow noise$NL s$SEED (done)"; else
        python -m hybridode.cli.run_simulation_flow --sample=1200 \
          --batch_size=10 --restart=3 --seed=$SEED --val_criterion=elbo \
          --path=model/elbo_s${SEED}_noise${NL}f_ --data_path=$DATA > "$LOG"
      fi
      # ensemble2/residual rows (reference run_noise_level.sh:28-30:
      # sample_cali = 400-300 = 100, reusing the expert/neural checkpoints).
      LOG=results/elbo_ensemble2_noise${NL}_s${SEED}.txt
      if done_log "$LOG"; then echo "skip ensemble2 noise$NL s$SEED (done)"; else
        python -m hybridode.cli.run_simulation_ensemble --sample=100 \
          --seed=$SEED --path=model/elbo_s${SEED}_noise${NL}_ --data_path=$DATA > "$LOG"
      fi
      LOG=results/elbo_residual_noise${NL}_s${SEED}.txt
      if done_log "$LOG"; then echo "skip residual noise$NL s$SEED (done)"; else
        python -m hybridode.cli.run_simulation_residual --sample=100 \
          --seed=$SEED --val_criterion=elbo \
          --path=model/elbo_s${SEED}_noise${NL}_ --data_path=$DATA > "$LOG"
      fi
    done
  done
  : > "$OUT"
  for SEED in $SEEDS; do
    for NL in 0.4 0.8; do
      for METHOD in neural expert hybrid flow ensemble2 residual; do
        LOG=results/elbo_${METHOD}_noise${NL}_s${SEED}.txt
        if done_log "$LOG"; then
          echo "# seed=$SEED noise=$NL method=$METHOD" >> "$OUT"
          tail -n 4 "$LOG" >> "$OUT"
        fi
      done
    done
  done
  echo "wrote $OUT"
else
  # dim8/dim12 under the reference run_dim.sh protocol + elbo criterion.
  OUT=results/results_dim_elbo.txt
  for SEED in $SEEDS; do
    for DIM in dim8 dim12; do
      DATA=data/datafile_${DIM}.pkl
      for METHOD in neural expert; do
        LOG=results/elbo_${METHOD}_${DIM}_s${SEED}.txt
        if done_log "$LOG"; then echo "skip $METHOD $DIM s$SEED (done)"; continue; fi
        python -m hybridode.cli.run_simulation --method=$METHOD --sample=1200 \
          --batch_size=10 --restart=3 --seed=$SEED --val_criterion=elbo \
          --path=model/elbo_s${SEED}_${DIM}_ --data_config=$DIM --data_path=$DATA > "$LOG"
      done
      LOG=results/elbo_hybrid_${DIM}_s${SEED}.txt
      if done_log "$LOG"; then echo "skip hybrid $DIM s$SEED (done)"; else
        python -m hybridode.cli.run_simulation --method=hybrid --sample=1200 \
          --batch_size=10 --arg_itr=1000 --restart=1 --seed=$SEED --val_criterion=elbo \
          --path=model/elbo_s${SEED}_${DIM}_ --data_config=$DIM --data_path=$DATA > "$LOG"
      fi
    done
  done
  : > "$OUT"
  for SEED in $SEEDS; do
    for DIM in dim8 dim12; do
      for METHOD in neural expert hybrid; do
        LOG=results/elbo_${METHOD}_${DIM}_s${SEED}.txt
        if done_log "$LOG"; then
          echo "# seed=$SEED dim=$DIM method=$METHOD" >> "$OUT"
          tail -n 4 "$LOG" >> "$OUT"
        fi
      done
    done
  done
  echo "wrote $OUT"
fi
