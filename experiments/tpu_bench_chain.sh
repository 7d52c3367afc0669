#!/bin/bash
# Fire-once TPU bench chain: the moment the axon relay answers, capture
#   1) a fresh bench.py JSON (stale:false) -> results/BENCH_live_r5.json
#   2) the seq-vs-vmap restart A/B       -> results/bench_restartmode.txt
# then commit both. Lock-guarded so only one chain ever runs.
set -u
cd /root/repo
LOCK=/tmp/tpu_bench_chain.lock
LOG=/tmp/tpu_bench_chain.log

# Freeze/thaw the CPU control queue (pidfiles under /tmp/hybridode_cpu) so
# its torch process can't pollute timed windows. bench.py pauses it itself;
# the restart-mode A/B runs plain CLI commands and needs this.
queue_tree() {
  local pids="" pf root frontier out
  for pf in /tmp/hybridode_cpu/*.pid; do
    [ -f "$pf" ] || continue
    root=$(cat "$pf" 2>/dev/null) || continue
    kill -0 "$root" 2>/dev/null || continue
    frontier=$root; pids="$pids $root"
    while [ -n "$frontier" ]; do
      out=$(ps -o pid= --ppid "$(echo $frontier | tr ' ' ',')" 2>/dev/null | tr '\n' ' ')
      frontier=$(echo $out | xargs)
      pids="$pids $frontier"
    done
  done
  echo $pids
}

while true; do
  if [ -f /tmp/TPU_UP ]; then
    mkdir "$LOCK" 2>/dev/null || exit 0
    echo "[$(date -u +%H:%M:%S)] relay up - starting chain" >> $LOG
    # Wait out any in-flight pytest (1 core; don't fight it).
    while ps aux | grep -v grep | grep -q "pytest tests/"; do sleep 60; done
    timeout 2400 python bench.py > results/BENCH_live_r5.json 2>> $LOG
    RC=$?
    echo "[$(date -u +%H:%M:%S)] bench.py rc=$RC: $(cat results/BENCH_live_r5.json)" >> $LOG
    if grep -q '"stale": true' results/BENCH_live_r5.json || [ ! -s results/BENCH_live_r5.json ]; then
      echo "[$(date -u +%H:%M:%S)] capture stale/empty - relay flapped; retrying later" >> $LOG
      rm -f results/BENCH_live_r5.json
      rmdir "$LOCK"
      sleep 120
      continue
    fi
    QP=$(queue_tree)
    [ -n "$QP" ] && kill -STOP $QP 2>/dev/null && echo "[chain] froze queue: $QP" >> $LOG
    # Deadman thaw in case this script dies mid-A/B.
    [ -n "$QP" ] && nohup bash -c "sleep 4200; kill -CONT $QP 2>/dev/null" >/dev/null 2>&1 &
    timeout 3600 bash experiments/bench_restartmode.sh >> $LOG 2>&1
    echo "[$(date -u +%H:%M:%S)] restartmode rc=$?" >> $LOG
    [ -n "$QP" ] && kill -CONT $QP 2>/dev/null
    git add results/BENCH_live_r5.json results/bench_restartmode.txt BENCH_LAST_GOOD.json 2>/dev/null
    git commit -q -m "Capture live TPU bench + seq-vs-vmap restart A/B (relay returned)" 2>>$LOG
    echo "[$(date -u +%H:%M:%S)] chain done, committed" >> $LOG
    exit 0
  fi
  sleep 60
done
