#!/bin/bash
# Second serialized TPU queue (round 4) — runs AFTER scripts/tpu_queue.sh
# drains: takes a BLOCKING flock on the same /tmp/tpu_queue.lock, so starting
# it while queue 1 is live is safe (it waits; no second TPU client races).
# Same operating rules as tpu_queue.sh: one client at a time, no in-flight
# kills, 10-min watchdog lines to /tmp/q_status.log.
#
# Experiments:
#   1. vmap_study2   bench_vmap_conv with the r4 scalar-fetch timing fence
#                    (block_until_ready through the relay is NOT a fence —
#                    docs/PERF.md "Measurement validity")
#   2. pallas_ab     flagship bench.py with DPI_PALLAS_WGRAD=1 — the r4
#                    layout-copy lever (Pallas wgrad for the res-0 convs)
#   3. field_scale   full-pipeline artifact on the single chip
set -u
cd /root/repo

exec 9>/tmp/tpu_queue.lock
flock 9   # blocking: waits for queue 1 to exit

echo "$(date -u +%H:%M:%S) queue2 started" >> /tmp/q_status.log

run() {  # run <name> <cmd...>
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

run vmap_study2 python scripts/bench_vmap_conv.py --platform default --batch 8
run pallas_ab env DPI_PALLAS_WGRAD=1 python bench.py
run field_scale python examples/field_scale.py --out field_scale.json

echo "$(date -u +%H:%M:%S) QUEUE2 COMPLETE" >> /tmp/q_status.log
