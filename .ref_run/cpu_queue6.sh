#!/bin/bash
# CPU torch queue, take 6 (round 4): the ONE remaining forecast-criterion
# losing cell across all three regenerated tracks — expert @ noise 0.8,
# seed 666 (committed 0.943, ours 0.950). Protocol is run_noise_level.sh
# verbatim (sample=1200, batch 10, restart=3, niters=400, val-ELBO
# selection); the tail-4 CSV of the output file is the cell value.
set -u
cd /root/repo/.ref_run
export PYTHONPATH=/root/repo/.ref_shim:/root/reference
export OMP_NUM_THREADS=1
for CELL in "expert 666"; do
  set -- $CELL; METHOD=$1; SEED=$2
  TAG=ref_${METHOD}_noise0.8_s${SEED}
  if [ -f results/${TAG}.txt ] && [ "$(grep -c '^rmse_x\|^rmse_z0\|^cprs' results/${TAG}.txt)" -ge 4 ]; then
    echo "skip $TAG (done)"; continue
  fi
  MP=model/${TAG}/
  mkdir -p $MP
  echo "[$(date +%H:%M:%S)] train+eval $TAG"
  stdbuf -oL -eL nice -n 15 python -u -m experiments.run_simulation --method=${METHOD} --device=c --seed=${SEED} \
    --sample=1200 --batch_size=10 --path=$MP --data_path=data/datafile_dose_noise_0.8.pkl \
    > results/${TAG}.txt 2>results/${TAG}.err
  echo "[$(date +%H:%M:%S)] $TAG rc=$?"
done
echo "[$(date +%H:%M:%S)] cpu queue6 done"
