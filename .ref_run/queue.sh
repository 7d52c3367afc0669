#!/usr/bin/env bash
# Reference-code seed-spread experiment (VERDICT r2 task 1a).
# Runs the ACTUAL reference run_simulation (under the torchdiffeq/properscoring
# shims) with its own Fig3.sh protocol: batch_size=10, restart=3 (CLI default),
# niters=400, elbo criterion — for hybrid sample={400,800} x seeds {666,123,42}.
set -u
cd /root/repo/.ref_run
export PYTHONPATH=/root/repo/.ref_shim:/root/reference
export OMP_NUM_THREADS=1
for SEED in 666 123 42; do
  for SAMPLE in 400 800; do
    TAG=ref_hybrid_${SAMPLE}_s${SEED}
    if [ -f results/${TAG}_test.txt ] && [ "$(grep -c '^rmse_x\|^rmse_z0\|^cprs' results/${TAG}_test.txt)" -ge 4 ]; then
      echo "skip $TAG (done)"; continue
    fi
    MP=model/${TAG}/
    mkdir -p $MP
    echo "[$(date +%H:%M:%S)] train $TAG"
    python -u -m experiments.run_simulation --method=hybrid --device=c --seed=$SEED \
      --sample=$SAMPLE --path=$MP --batch_size=10 > results/${TAG}.txt 2>results/${TAG}.err
    echo "[$(date +%H:%M:%S)] eval $TAG"
    python -u -m experiments.run_simulation --method=hybrid --device=c --seed=$SEED \
      --sample=$SAMPLE --path=$MP --data_path=data/datafile_dose_exp_test.pkl --eval=y \
      > results/${TAG}_test.txt 2>>results/${TAG}.err
  done
done
echo "[$(date +%H:%M:%S)] queue done"
