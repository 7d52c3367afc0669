#!/usr/bin/env bash
# Budget-sensitivity check for the niters=300 real-track head-to-head
# (VERDICT r3 weak #6): re-run a subset at the reference's FULL budget
# (niters=1500, experiments/real.sh:9-17 via run_real.py) and commit the
# val-loss curves + horizon RMSEs. Ours: hybrid (the ODE flagship, with
# --curve_path) and gruode; ref side: gruode (discrete-time, the only
# method cheap enough for 1500 torch iterations on this 1-core host).
# Same stand-in arrays and flags as experiments/real_headtohead.sh.
set -u
cd "$(dirname "$0")/.."
OUTDIR=results/real_budget
mkdir -p "$OUTDIR"

run_ours() { # method flags...
  local METHOD=$1; shift
  local LOG=$OUTDIR/ours_${METHOD}_100_n1500.txt
  [ -f "$LOG" ] && [ "$(grep -c '^rmse_x' "$LOG" 2>/dev/null)" -ge 4 ] && { echo "skip ours $METHOD"; return; }
  echo "[$(date +%H:%M:%S)] ours $METHOD 1500"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -u -m hybridode.cli.run_real --method=$METHOD --sample=100 \
    --data_path=data_real/ --niters=1500 \
    --curve_path=$OUTDIR/curve_ours_${METHOD}_100.csv "$@" \
    > "$LOG" 2>"$LOG.err" || echo "ours $METHOD FAILED"
}

run_ours hybrid --ode_method=midpoint
run_ours gruode

REFLOG=$OUTDIR/ref_gruode_100_n1500.txt
if ! { [ -f "$REFLOG" ] && [ "$(grep -c '^rmse_x' "$REFLOG" 2>/dev/null)" -ge 4 ]; }; then
  echo "[$(date +%H:%M:%S)] ref gruode 1500"
  (cd .ref_run/real && PYTHONPATH=/root/repo/.ref_shim:/root/reference OMP_NUM_THREADS=1 \
    python -u -m experiments.run_real --method=gruode --sample=100 --niters=1500) \
    > "$REFLOG" 2>"$REFLOG.err" || echo "ref gruode FAILED"
fi

# --- Round-4 addendum: 300-iter cells on the SAME (canonical) arrays as the
# 1500-iter runs above, so budget effects are not confounded with the
# round-4 data_real regeneration (the committed head-to-head summary.csv
# was computed on the previous arrays). One seed (666), both sides,
# gruode + hybrid.
run_cell() { # side method niters [seed]
  local SIDE=$1 METHOD=$2 NITERS=$3 SEED=${4:-666}
  local SUFFIX=""; [ "$SEED" != 666 ] && SUFFIX=_s$SEED
  local LOG=$OUTDIR/${SIDE}_${METHOD}_100_n${NITERS}${SUFFIX}.txt
  [ -f "$LOG" ] && [ "$(grep -c '^rmse_x' "$LOG" 2>/dev/null)" -ge 4 ] && { echo "skip $LOG"; return; }
  echo "[$(date +%H:%M:%S)] $SIDE $METHOD $NITERS s$SEED"
  # Same per-method flags both sides (real_headtohead.sh / reference real.sh).
  local FLAGS=""; [ "$METHOD" = hybrid ] && FLAGS="--ode_method=midpoint"
  if [ "$SIDE" = ours ]; then
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python -u -m hybridode.cli.run_real --method=$METHOD --sample=100 --seed=$SEED \
      --data_path=data_real/ --niters=$NITERS $FLAGS \
      > "$LOG" 2>"$LOG.err" || echo "$LOG FAILED"
  else
    (cd .ref_run/real && PYTHONPATH=/root/repo/.ref_shim:/root/reference OMP_NUM_THREADS=1 \
      python -u -m experiments.run_real --method=$METHOD --sample=100 --seed=$SEED --niters=$NITERS $FLAGS) \
      > "$LOG" 2>"$LOG.err" || echo "$LOG FAILED"
  fi
}

run_cell ours gruode 300
run_cell ref  gruode 300
run_cell ours hybrid 300
run_cell ref  hybrid 300
run_cell ref  hybrid 1500
echo "[$(date +%H:%M:%S)] real_budget done"
