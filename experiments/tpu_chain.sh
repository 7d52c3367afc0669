#!/bin/bash
# Round-3 TPU master chain. Stages run strictly sequentially on the one chip:
#   1. wait for the in-flight noise-ELBO sweep (old script image) to drain
#   2. re-run parity_elbo.sh noise  — fills the ensemble2/residual cells the
#      old image didn't queue, and (re)writes results/results_noise_elbo.txt
#   3. stepspace_ab.sh              — lockstep-controller A/B (VERDICT #1b)
#   4. SIDE=ours real_headtohead.sh — our half of the real-track head-to-head
#   5. perf block (cpu torch queue paused): roofline, bench_scale, fused bench
set -u
cd /root/repo

wait_pid() { while [ -n "${1:-}" ] && kill -0 "$1" 2>/dev/null; do sleep 60; done; }
tree_pids() {
  local out="$1" frontier="$1" next
  while [ -n "$frontier" ]; do
    next=$(ps -o pid= --ppid "$(echo $frontier | tr ' ' ',')" 2>/dev/null | tr -s ' \n' ' ')
    out="$out $next"; frontier="$next"
  done
  echo $out
}

echo "[$(date +%H:%M:%S)] stage 1: waiting for noise sweep"
wait_pid "$(cat /tmp/noise_elbo.pid 2>/dev/null)"

echo "[$(date +%H:%M:%S)] stage 2: noise re-run (ensemble2/residual fill)"
bash experiments/parity_elbo.sh noise > /tmp/noise_elbo2.log 2>&1
echo "rc=$?"

echo "[$(date +%H:%M:%S)] stage 3: stepspace_ab"
bash experiments/stepspace_ab.sh > /tmp/stepspace_ab.log 2>&1
echo "rc=$?"

echo "[$(date +%H:%M:%S)] stage 4: real head-to-head (ours side)"
SIDE=ours REAL_NITERS=300 bash experiments/real_headtohead.sh > /tmp/h2h_ours.log 2>&1
echo "rc=$?"

echo "[$(date +%H:%M:%S)] stage 5: perf block"
CQ=$(cat /tmp/cpuqueue2.pid 2>/dev/null || true)
PIDS=""
if [ -n "$CQ" ] && kill -0 "$CQ" 2>/dev/null; then
  PIDS=$(tree_pids "$CQ")
  echo "pausing cpu queue: $PIDS"
  kill -STOP $PIDS 2>/dev/null
fi
python experiments/roofline.py > /tmp/roofline.log 2>&1; echo "roofline rc=$?"
python experiments/bench_scale.py > /tmp/bench_scale.log 2>&1; echo "bench_scale rc=$?"
BENCH_FUSED=1 python bench.py > /tmp/bench_fused.json 2>/tmp/bench_fused.err; echo "bench_fused rc=$?"
if [ -n "$PIDS" ]; then kill -CONT $PIDS 2>/dev/null; echo "cpu queue resumed"; fi
echo "[$(date +%H:%M:%S)] tpu chain done"
