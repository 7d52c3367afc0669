#!/usr/bin/env bash
# Bench knob A/B matrix on the real chip (run on an otherwise-idle host).
# Writes one JSON line per configuration to results/bench_ab.jsonl.
set -e
cd "$(dirname "$0")/.."
OUT=results/bench_ab.jsonl
: > "$OUT"

run() {
  local tag=$1; shift
  echo "== $tag ($*)" >&2
  local line
  line=$(env "$@" python bench.py 2>/dev/null | tail -n 1)
  echo "{\"config\": \"$tag\", ${line#\{}" >> "$OUT"
  echo "$line" >&2
}

run baseline                     X=1
run steps192    BENCH_MAX_STEPS=192
run steps160    BENCH_MAX_STEPS=160
run adjoint     BENCH_ADJOINT=1
run adjoint192  BENCH_ADJOINT=1 BENCH_MAX_STEPS=192
run adjoint_rec BENCH_ADJOINT=1 BENCH_MAX_RECORD=128
run adjoint_rec192 BENCH_ADJOINT=1 BENCH_MAX_STEPS=192 BENCH_MAX_RECORD=128
run calibrate   BENCH_CALIBRATE=1
run calibrate_adjoint BENCH_CALIBRATE=1 BENCH_ADJOINT=1
echo "wrote $OUT"
