#!/usr/bin/env bash
# Collect the reference-code seed-spread cells (.ref_run/results/, produced
# by the torch-CPU queue under the torchdiffeq shim — VERDICT r2 task 1a)
# next to our ELBO-criterion cells into results/ref_seed_spread.md.
set -u
cd "$(dirname "$0")/.."
OUT=results/ref_seed_spread.md
{
  echo "## Reference code, run by us: hybrid ELBO-criterion cells (torch CPU via shim)"
  echo
  echo "Protocol: the reference's own Fig3.sh (batch_size=10, restart=3,"
  echo "niters=400, full-sequence val-ELBO selection), reference"
  echo "run_simulation.py verbatim, PYTHONPATH shim for torchdiffeq/"
  echo "properscoring. ~5-6 h/cell on this 1-core host, so coverage grows"
  echo "as the queue drains; the reference's committed results_sample.txt"
  echo "values are single runs (400 -> 0.625, 800 -> 0.621)."
  echo
  echo "| sample | seed | ref-code rmse_x (our run) | ours per-sample | ours lockstep | ref committed |"
  echo "|---|---|---|---|---|---|"
  for SAMPLE in 400 800; do
    [ "$SAMPLE" = 400 ] && REFC=0.625 || REFC=0.621
    for SEED in 666 123 42; do
      R=$(grep '^rmse_x' .ref_run/results/ref_hybrid_${SAMPLE}_s${SEED}_test.txt 2>/dev/null | cut -d, -f2)
      O=$(grep '^rmse_x' results/elbo_hybrid_${SAMPLE}_s${SEED}_test.txt 2>/dev/null | cut -d, -f2)
      L=$(grep '^rmse_x' results/elbo_lockstep_hybrid_${SAMPLE}_s${SEED}_test.txt 2>/dev/null | cut -d, -f2)
      [ -z "${R}${L}" ] && continue
      echo "| $SAMPLE | $SEED | ${R:-—} | ${O:-—} | ${L:-—} | $REFC |"
    done
  done
  echo
  echo "## Expert method, sample=400 (ours ELBO-rule mean 0.817±0.011; ref committed 0.730)"
  echo
  echo "| seed | ref-code rmse_x (our run) | ours (ELBO rule) |"
  echo "|---|---|---|"
  for SEED in 666 123 42; do
    R=$(grep '^rmse_x' .ref_run/results/ref_expert_400_s${SEED}_test.txt 2>/dev/null | cut -d, -f2)
    O=$(grep '^rmse_x' results/elbo_expert_400_s${SEED}_test.txt 2>/dev/null | cut -d, -f2)
    [ -z "$R" ] && continue
    echo "| $SEED | $R | ${O:-—} |"
  done
} > "$OUT"
echo "wrote $OUT"
