#!/usr/bin/env bash
# Round-4 end-game (run AFTER the continuation's TRAIN_DEADLINE=1787192700,
# ~02:25 — tools/round4_continuation.sh extends training past the main
# schedule's 00:45 deadline):
# everything is timeout-bounded so nothing can be live on the chip when the
# driver captures BENCH_r04 (VERDICT r03 weak 1).  Steps:
#   1. verify the schedule is over + chip is idle
#   2. pre-warm the persistent XLA cache with a local bench run (the
#      driver's capture then skips most compiles)
#   3. quiet-box default-suite timing (the <15 min claim, VERDICT item 6)
# Run each phase manually; this script is a checklist as much as a tool.
set -u
cd "$(dirname "$0")/.."

echo "== 0. stop-file (belt and braces: supervisors stop between segments) =="
touch /tmp/stop_training

echo "== 1. residual training processes (expect none) =="
ps -eo pid,args | grep -E "fastvocoder_tpu\.bin\.(train|evaluation)" | grep -v grep || echo "  none"
ps -eo pid,args | grep -E "round4|train_supervised" | grep -v grep || echo "  none"

echo "== 2. chip probe =="
timeout 60 python3 -c "
import jax, jax.numpy as jnp
print('probe ok:', float(jnp.sum(jnp.ones((8,8)))))" || echo "PROBE FAILED — wait and retry before benching"

echo "== 3. local bench warm run (pre-warms /tmp/fastvocoder_jax_cache) =="
timeout 620 python3 bench.py > /tmp/bench_warm.json 2> /tmp/bench_warm.log
echo "rc=$? (tail of artifact:)"
tail -1 /tmp/bench_warm.json
tail -5 /tmp/bench_warm.log

echo "== 4. quiet default-suite timing =="
( cd "$(pwd)" && time python -m pytest tests/ -q -p no:cacheprovider ) \
    > /tmp/suite_quiet.log 2>&1
tail -3 /tmp/suite_quiet.log
