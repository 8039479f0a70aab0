#!/bin/bash
# Serialized TPU experiment queue (round 4).
#
# Operating rules (CLAUDE.md): ONE TPU client at a time; NEVER kill a client
# mid-compile (a SIGTERM'd client wedges the relay grant and every later TPU
# op hangs until the remote side times out). Hence:
#   * an flock on /tmp/tpu_queue.lock makes concurrent queue invocations
#     impossible (round-3 postmortem: three stale runners raced on relay
#     return);
#   * experiments run WITHOUT a hard timeout — the queue is already
#     serialized, and cold compiles in new graph families have taken
#     ~100 min. A watchdog line is logged every 10 min so a wedged client
#     is visible, but killing is a human/agent decision made BETWEEN
#     experiments, never in-flight.
#
# Experiments (priority order; each logs to /tmp/q_<name>.log):
#   1. bench_default     fresh default-config bench.py number (regression +
#                        the driver-verified headline)
#   2. bench_deep1/2     BENCH_PHASE_DEEP={1,2} flagship timing (r3's
#                        lane-starvation lever, still untimed on-chip)
#   3. dist_tpu_highest  golden_3d_dist ours side on TPU with f32
#                        Precision.HIGHEST (12 seeds x 600 iters at 32^3)
#   4. vmap_study        calibrated vmap-conv batching numbers on-chip
#   5. f32_ab            f32 conv precision A/B (HIGHEST vs default) at 32^3
set -u
cd /root/repo

exec 9>/tmp/tpu_queue.lock
if ! flock -n 9; then
  echo "another tpu_queue holds /tmp/tpu_queue.lock; exiting" >&2
  exit 1
fi

echo "$(date -u +%H:%M:%S) queue started; waiting for /tmp/tpu_up" > /tmp/q_status.log
while [ ! -f /tmp/tpu_up ]; do sleep 60; done
echo "$(date -u +%H:%M:%S) TPU up; running queue" >> /tmp/q_status.log

run() {  # run <name> <cmd...> — no timeout: see header
  local name=$1; shift
  echo "$(date -u +%H:%M:%S) START $name" >> /tmp/q_status.log
  "$@" > "/tmp/q_$name.log" 2>&1 &
  local pid=$!
  local secs=0
  # 30 s poll so the next queued job starts promptly; the wedged-client
  # watchdog line still fires every 10 min of elapsed time
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    secs=$((secs + 30))
    if [ $((secs % 600)) -eq 0 ]; then
      echo "$(date -u +%H:%M:%S) WATCHDOG $name still running ($((secs / 60))m)" >> /tmp/q_status.log
    fi
  done
  wait "$pid"  # reap + collect the exit status (bash keeps it post-exit)
  local rc=$?
  echo "$(date -u +%H:%M:%S) DONE $name rc=$rc" >> /tmp/q_status.log
}

run bench_deep1 env BENCH_PHASE_DEEP=1 python bench.py
run bench_deep2 env BENCH_PHASE_DEEP=2 python bench.py
run dist_tpu_highest python scripts/golden_3d_dist.py \
    --side ours --platform default --label ours_tpu_highest \
    --problems 1,6,7 --nseeds 4 --iters 600 --out golden_3d_dist_tpu.json
run vmap_study python scripts/bench_vmap_conv.py --platform default --batch 8
run f32_ab python scripts/bench_f32_precision.py

echo "$(date -u +%H:%M:%S) QUEUE COMPLETE" >> /tmp/q_status.log
