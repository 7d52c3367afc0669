#!/bin/bash
# CPU torch queue, take 3: finish the reference-code seed grid
# (400/s42 completes the sample=400 row; then the 800 seeds).
set -u
cd /root/repo/.ref_run
export PYTHONPATH=/root/repo/.ref_shim:/root/reference
export OMP_NUM_THREADS=1
for CELL in "400 42" "800 123" "800 42"; do
  set -- $CELL; SAMPLE=$1; SEED=$2
  TAG=ref_hybrid_${SAMPLE}_s${SEED}
  if [ -f results/${TAG}_test.txt ] && [ "$(grep -c '^rmse_x\|^rmse_z0\|^cprs' results/${TAG}_test.txt)" -ge 4 ]; then
    echo "skip $TAG (done)"; continue
  fi
  MP=model/${TAG}/
  mkdir -p $MP
  echo "[$(date +%H:%M:%S)] train $TAG"
  stdbuf -oL -eL python -u -m experiments.run_simulation --method=hybrid --device=c --seed=$SEED \
    --sample=$SAMPLE --path=$MP --batch_size=10 > results/${TAG}.txt 2>results/${TAG}.err
  echo "[$(date +%H:%M:%S)] train $TAG rc=$?"
  echo "[$(date +%H:%M:%S)] eval $TAG"
  stdbuf -oL -eL python -u -m experiments.run_simulation --method=hybrid --device=c --seed=$SEED \
    --sample=$SAMPLE --path=$MP --data_path=data/datafile_dose_exp_test.pkl --eval=y \
    > results/${TAG}_test.txt 2>>results/${TAG}.err
  echo "[$(date +%H:%M:%S)] eval $TAG rc=$?"
done
echo "[$(date +%H:%M:%S)] cpu queue3 done"
