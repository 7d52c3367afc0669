#!/bin/bash
# CPU torch queue, take 2: (1) eval-only for the already-trained sim cell
# (ref_hybrid_400_s666 — its 5h training completed; only evaluate() is
# missing), (2) real-track ref-side head-to-head at REAL_NITERS=300,
# (3) if time remains, further sim cells.
set -u
cd /root/repo/.ref_run
export PYTHONPATH=/root/repo/.ref_shim:/root/reference
export OMP_NUM_THREADS=1

TAG=ref_hybrid_400_s666
if ! { [ -f results/${TAG}_test.txt ] && [ "$(grep -c '^rmse_x\|^rmse_z0\|^cprs' results/${TAG}_test.txt)" -ge 4 ]; }; then
  echo "[$(date +%H:%M:%S)] eval-only $TAG"
  stdbuf -oL -eL python -u -m experiments.run_simulation --method=hybrid --device=c --seed=666 \
    --sample=400 --path=model/${TAG}/ --data_path=data/datafile_dose_exp_test.pkl --eval=y \
    > results/${TAG}_test.txt 2>>results/${TAG}.err
  echo "[$(date +%H:%M:%S)] eval $TAG rc=$?"
fi

echo "[$(date +%H:%M:%S)] starting real-track ref side"
SIDE=ref REAL_NITERS=300 bash /root/repo/experiments/real_headtohead.sh >> /root/repo/.ref_run/queue.log 2>&1
echo "[$(date +%H:%M:%S)] real-track ref side rc=$?"

# Remaining sim cells (each ~5h train + eval) — run while wall time remains.
for CELL in "800 666" "400 123" "400 42"; do
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
echo "[$(date +%H:%M:%S)] cpu queue2 done"
