#!/bin/bash
# Probe the axon relay every 120s; write /tmp/TPU_UP when it answers.
while true; do
  if timeout 5 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; then
    date -u +"%H:%M:%S relay UP" >> /tmp/tpuwatch.log
    touch /tmp/TPU_UP
  else
    rm -f /tmp/TPU_UP
  fi
  sleep 120
done
