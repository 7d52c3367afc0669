#!/usr/bin/env bash
# Restart-mode A/B on the real chip: the same 3-restart x 100-iter hybrid
# sweep cell trained (a) sequentially — one fused whole-restart dispatch per
# restart — and (b) batched — ALL restarts as one vmapped device program
# (--restart_mode=vmap). Wall-clock ratio shows how much restart-lane
# parallelism the single chip's spare capacity buys. Run on an idle host
# with the tunnel relay up.
set -e
cd "$(dirname "$0")/.."
OUT=results/bench_restartmode.txt
: > "$OUT"

for MODE in seq vmap; do
  for REP in 1 2; do
    T0=$(date +%s.%N)
    python -u -m hybridode.cli.run_simulation --method hybrid --sample 400 \
      --restart 3 --arg_itr 100 --restart_mode $MODE \
      --path model/bench_rm_ --data_path data/datafile_dose_exp.pkl \
      > /tmp/bench_rm_${MODE}_${REP}.txt 2>/dev/null
    T1=$(date +%s.%N)
    WALL=$(python -c "print(f'{$T1-$T0:.2f}')")
    BEST=$(grep "best loss" /tmp/bench_rm_${MODE}_${REP}.txt | tail -1 | awk '{print $NF}')
    echo "mode=$MODE rep=$REP wall_s=$WALL best=$BEST" | tee -a "$OUT"
  done
done
echo "wrote $OUT"
