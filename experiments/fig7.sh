#!/usr/bin/env bash
# Horizon curves: pickle per-time-step RMSE/CRPS for each method
# (reference Fig7.sh -> run_eval.py).
set -e
cd "$(dirname "$0")/.."
DATA=${DATA:-data/datafile_dose_exp_test.pkl}
mkdir -p results
for METHOD in neural expert hybrid; do
  python -m hybridode.cli.run_eval --method=$METHOD --path=model/800_ \
    --data_path=$DATA --result_path=results/horizon_${METHOD}.pkl
done
python -m hybridode.cli.run_simulation_ensemble --sample=100 --path=model/800_ \
  --data_path=$DATA --horizon=1 --result_path=results/horizon_ensemble.pkl
python -m hybridode.cli.run_simulation_residual --sample=100 --path=model/800_ \
  --data_path=$DATA --horizon=1 --result_path=results/horizon_residual.pkl --eval=y
echo "wrote results/horizon_*.pkl"
