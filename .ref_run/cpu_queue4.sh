#!/bin/bash
# CPU torch queue, take 4: the expert method at sample=400 x 3 seeds —
# the one sample-track cell family where our ELBO-criterion mean (0.817)
# trails the reference's committed single run (0.730).
set -u
cd /root/repo/.ref_run
export PYTHONPATH=/root/repo/.ref_shim:/root/reference
export OMP_NUM_THREADS=1
for SEED in 666 123 42; do
  TAG=ref_expert_400_s${SEED}
  if [ -f results/${TAG}_test.txt ] && [ "$(grep -c '^rmse_x\|^rmse_z0\|^cprs' results/${TAG}_test.txt)" -ge 4 ]; then
    echo "skip $TAG (done)"; continue
  fi
  MP=model/${TAG}/
  mkdir -p $MP
  echo "[$(date +%H:%M:%S)] train $TAG"
  stdbuf -oL -eL python -u -m experiments.run_simulation --method=expert --device=c --seed=$SEED \
    --sample=400 --path=$MP --batch_size=10 > results/${TAG}.txt 2>results/${TAG}.err
  echo "[$(date +%H:%M:%S)] train $TAG rc=$?"
  echo "[$(date +%H:%M:%S)] eval $TAG"
  stdbuf -oL -eL python -u -m experiments.run_simulation --method=expert --device=c --seed=$SEED \
    --sample=400 --path=$MP --data_path=data/datafile_dose_exp_test.pkl --eval=y \
    > results/${TAG}_test.txt 2>>results/${TAG}.err
  echo "[$(date +%H:%M:%S)] eval $TAG rc=$?"
done
echo "[$(date +%H:%M:%S)] cpu queue4 done"
