#!/bin/bash
# CPU torch queue: (1) sim-track reference cell(s) under the full Fig3
# protocol, (2) real-track ref-side head-to-head at REAL_NITERS=300.
set -u
cd /root/repo/.ref_run
export PYTHONPATH=/root/repo/.ref_shim:/root/reference
export OMP_NUM_THREADS=1
for CELL in "400 666" "800 666" "400 123" "800 123" "400 42" "800 42"; do
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
  break   # one full-protocol cell first; rest of round goes to the real track
done
echo "[$(date +%H:%M:%S)] sim cell done; starting real-track ref side"
SIDE=ref REAL_NITERS=300 bash /root/repo/experiments/real_headtohead.sh >> /root/repo/.ref_run/queue.log 2>&1
echo "[$(date +%H:%M:%S)] cpu queue done"
