#!/usr/bin/env bash
# Reference-code real-track head-to-head on the STAND-IN arrays (VERDICT r2
# task 5): runs the ACTUAL reference experiments/run_real.py (torch CPU, under
# the torchdiffeq/properscoring shims) against the same stand-in pickles our
# cli.run_real sweep used (results/results_real_sample.csv), with the
# reference's own protocol (niters=1500, batch 100, test_freq 100,
# early_stop 10, seed 666). Methods cheap-first so partial coverage is useful.
#
# cwd must be .ref_run/real so the loader's default data_path="../data/"
# resolves to .ref_run/data (stand-in arrays symlinked there).
set -u
cd /root/repo/.ref_run/real
export PYTHONPATH=/root/repo/.ref_shim:/root/reference
export OMP_NUM_THREADS=1
for SAMPLE in 100 500; do
  for METHOD in tlstm gruode neural expert hybrid 2nd; do
    TAG=ref_real_${METHOD}_${SAMPLE}
    if [ -f results/${TAG}.txt ] && [ "$(grep -c '^rmse_x' results/${TAG}.txt)" -ge 4 ]; then
      echo "skip $TAG (done)"; continue
    fi
    mkdir -p model
    echo "[$(date +%H:%M:%S)] $TAG"
    python -u -m experiments.run_real --method=$METHOD --seed=666 \
      --sample=$SAMPLE > results/${TAG}.txt 2>results/${TAG}.err
  done
done
echo "[$(date +%H:%M:%S)] real queue done"
