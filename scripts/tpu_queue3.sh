#!/bin/bash
# Third serialized TPU queue (round 4) — blocks on /tmp/tpu_queue.lock until
# queue 2 drains. Same rules: one client, no in-flight kills, watchdog lines.
#
# Experiments:
#   1. pallas_ab2   flagship bench with the v2 (unpadded, HBM-transient-free)
#                   Pallas wgrad — v1 OOM'd the backward via its pad copies
#   2. profile_pallas  per-op profile of the winning config, only meaningful
#                   if pallas_ab2 produced a number (it tolerates failure)
set -u
cd /root/repo

exec 9>/tmp/tpu_queue.lock
flock 9

echo "$(date -u +%H:%M:%S) queue3 started" >> /tmp/q_status.log

run() {
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) START $name" >> /tmp/q_status.log
  "$@" > "/tmp/q_$name.log" 2>&1 &
  local pid=$!
  local mins=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 600
    mins=$((mins + 10))
    echo "$(date -u +%H:%M:%S) WATCHDOG $name still running (${mins}m)" >> /tmp/q_status.log
  done
  wait "$pid"
  echo "$(date -u +%H:%M:%S) DONE $name rc=$?" >> /tmp/q_status.log
}

run pallas_ab2 env DPI_PALLAS_WGRAD=1 python bench.py

echo "$(date -u +%H:%M:%S) QUEUE3 COMPLETE" >> /tmp/q_status.log
