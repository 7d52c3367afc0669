#!/usr/bin/env bash
# Real-track head-to-head on the SAME stand-in arrays: the ACTUAL reference
# code (experiments/run_real.py under the torchdiffeq/properscoring shims,
# DataGeneratorReal pointed at ../data = our stand-in pickles) vs our
# hybridode.cli.run_real — identical method flags (reference real.sh:8-16),
# identical niters/batch/test_freq, samples {100,500}.
#
# The full reference protocol (niters=1500) is CPU-prohibitive on this
# 1-core host; REAL_NITERS (default 300) sets a reduced-but-identical
# protocol for BOTH sides, which is what makes the comparison controlled.
#
# Usage: REAL_NITERS=300 bash experiments/real_headtohead.sh
# SIDE=ours|ref|both (default both) runs only one side — lets the TPU-bound
# ours-cells and the CPU-bound torch ref-cells run as separate queues on
# this 1-core host; the summary block only emits rows with both sides done.
set -u
cd "$(dirname "$0")/.."
N=${REAL_NITERS:-300}
SAMPLES=${SAMPLES:-100 500}
SIDE=${SIDE:-both}
REFDIR=.ref_run
OUTDIR=results/real_headtohead
mkdir -p "$OUTDIR" "$REFDIR/model" "$REFDIR/results" model

# method -> extra flags (reference real.sh:8-16)
flags_for() {
  case "$1" in
    neural) echo "--ode_method=midpoint" ;;
    2nd)    echo "--ode_method=rk4 --encoder_output_dim=40" ;;
    tlstm)  echo "" ;;
    gruode) echo "" ;;
    hybrid) echo "--ode_method=midpoint" ;;
    expert) echo "--encoder_output_dim=4 --ode_method=midpoint" ;;
  esac
}

done_log() { [ -f "$1" ] && [ "$(grep -c '^rmse_x' "$1" 2>/dev/null)" -ge 4 ]; }

for SAMPLE in $SAMPLES; do
  for METHOD in neural 2nd tlstm gruode hybrid expert; do
    FLAGS=$(flags_for $METHOD)
    REFLOG=$OUTDIR/ref_${METHOD}_${SAMPLE}.txt
    if [ "$SIDE" != "ours" ] && ! done_log "$REFLOG"; then
      echo "[ref ] $METHOD $SAMPLE"
      # cwd must be $REFDIR/real so DataGeneratorReal's default
      # data_path="../data/" resolves to $REFDIR/data (the stand-in arrays).
      (cd "$REFDIR/real" && PYTHONPATH=/root/repo/.ref_shim:/root/reference OMP_NUM_THREADS=1 \
        python -u -m experiments.run_real --method=$METHOD --sample=$SAMPLE \
        --niters=$N $FLAGS) > "$REFLOG" 2>"$REFLOG.err" || echo "ref $METHOD $SAMPLE FAILED"
    fi
    OURLOG=$OUTDIR/ours_${METHOD}_${SAMPLE}.txt
    if [ "$SIDE" != "ref" ] && ! done_log "$OURLOG"; then
      echo "[ours] $METHOD $SAMPLE"
      python -u -m hybridode.cli.run_real --method=$METHOD --sample=$SAMPLE \
        --data_path=data_real/ \
        --niters=$N $FLAGS > "$OURLOG" 2>"$OURLOG.err" || echo "ours $METHOD $SAMPLE FAILED"
    fi
  done
done

# side-by-side summary: one row per (method, sample, horizon)
SUMMARY=$OUTDIR/summary.csv
echo "method,sample,t1,ours_rmse,ours_sd,ref_rmse,ref_sd" > "$SUMMARY"
for SAMPLE in $SAMPLES; do
  for METHOD in neural 2nd tlstm gruode hybrid expert; do
    OURLOG=$OUTDIR/ours_${METHOD}_${SAMPLE}.txt
    REFLOG=$OUTDIR/ref_${METHOD}_${SAMPLE}.txt
    if done_log "$OURLOG" && done_log "$REFLOG"; then
      paste -d, \
        <(grep '^rmse_x' "$OURLOG" | tail -n 4 | cut -d, -f2-4) \
        <(grep '^rmse_x' "$REFLOG" | tail -n 4 | cut -d, -f3-4) \
        | while IFS=, read T1 ORM OSD RRM RSD; do
            echo "$METHOD,$SAMPLE,$T1,$ORM,$OSD,$RRM,$RSD" >> "$SUMMARY"
          done
    fi
  done
done
echo "wrote $SUMMARY"
