#!/bin/bash
# Fourth serialized TPU queue (round 4) — takes /tmp/tpu_queue.lock like its
# predecessors. Same rules: one client, no in-flight kills, watchdog lines.
#
# Experiments:
#   1. pallas_ab4   flagship bench with the v4 Pallas wgrad (Ci-chunked grid,
#                   static W-taps, dynamic H-tap on the untiled dim) — v2
#                   blew the VMEM stack, v3 failed Mosaic's sublane-alignment
#                   proof; v4 fixes both by construction.
set -u
cd /root/repo

exec 9>/tmp/tpu_queue.lock
flock 9

echo "$(date -u +%H:%M:%S) queue4 started" >> /tmp/q_status.log

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

run pallas_ab41 env DPI_PALLAS_WGRAD=1 python bench.py

echo "$(date -u +%H:%M:%S) QUEUE4 COMPLETE" >> /tmp/q_status.log
