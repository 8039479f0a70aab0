#!/bin/bash
# Serialized TPU experiment queue for round 3 (run once the relay returns).
# Waits for /tmp/tpu_up (created by the probe loop), then runs the pending
# on-chip experiments ONE AT A TIME (the relay wedges if two clients race
# or one is killed mid-compile — generous timeouts, no overlap).
#
# Experiments (priority order; each logs to /tmp/q_<name>.log):
#   1. dist_tpu_highest  golden_3d_dist ours side on TPU with the r3
#                        f32 Precision.HIGHEST fix (12 seeds, ~8 s each
#                        after one compile) -> golden_3d_dist_tpu.json
#   2. bench_deep1/2     BENCH_PHASE_DEEP={1,2} flagship timing (the r3
#                        lane-starvation lever; relay died before timing)
#   3. bench_default     fresh default-config number (regression check)
#   4. vmap_study        calibrated vmap-conv batching numbers on-chip
set -u
cd /root/repo

echo "$(date -u +%H:%M:%S) queue started; waiting for /tmp/tpu_up" > /tmp/q_status.log
while [ ! -f /tmp/tpu_up ]; do sleep 60; done
echo "$(date -u +%H:%M:%S) TPU up; running queue" >> /tmp/q_status.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "$(date -u +%H:%M:%S) START $name" >> /tmp/q_status.log
  timeout "$to" "$@" > "/tmp/q_$name.log" 2>&1
  echo "$(date -u +%H:%M:%S) DONE $name rc=$?" >> /tmp/q_status.log
}

run dist_tpu_highest 7200 python scripts/golden_3d_dist.py \
    --side ours --platform default --label ours_tpu_highest \
    --problems 1,6,7 --nseeds 4 --iters 600 --out golden_3d_dist_tpu.json

run bench_deep1 3600 env BENCH_PHASE_DEEP=1 python bench.py
run bench_deep2 3600 env BENCH_PHASE_DEEP=2 python bench.py
run bench_default 3600 python bench.py
run vmap_study 3600 python scripts/bench_vmap_conv.py --platform default --batch 8

echo "$(date -u +%H:%M:%S) QUEUE COMPLETE" >> /tmp/q_status.log
