#!/bin/bash
# Round-3 chip job chain (run detached with setsid nohup):
#   0. wait for the axon TPU backend to return (it was UNAVAILABLE at
#      round start — same outage as BENCH_r02)
#   1. batch-shape sweep at bptt=2010 (one shape per process; resumable)
#   2. resume the 10k-bucket Fig-3a run (epoch ~80 -> 1250) with the
#      sweep winner's shape
# Progress: /tmp/chip_chain.log and /tmp/fig3a_10k_r3.log
set -u
cd /root/repo
LOG=/tmp/chip_chain.log
echo "$(date) chain start" >> "$LOG"

# 0. wait for chip (probe must both init the backend AND execute)
while true; do
  if timeout 240 python -c "import jax; jax.devices(); import jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" >/dev/null 2>&1; then
    break
  fi
  echo "$(date) chip still down" >> "$LOG"
  sleep 180
done
echo "$(date) chip UP" >> "$LOG"

# 1. sweep, one shape per process for isolation
for SHAPE in 4x25 10x10 20x5 25x4 50x2 100x1; do
  timeout 1800 python -u experiments/batch_shape_sweep.py \
    --shapes "$SHAPE" --out results/batch_sweep.json >> "$LOG" 2>&1
done
echo "$(date) sweep done: $(cat results/batch_sweep.json 2>/dev/null | tr -d '\n')" >> "$LOG"

WINNER=$(python -c "import json; d=json.load(open('results/batch_sweep.json')); print(d['winner'] or '4x25')" 2>/dev/null || echo 4x25)
B=${WINNER%x*}; A=${WINNER#*x}
echo "$(date) adopting batch_size=$B agg=$A" >> "$LOG"

# 2. resume the 10k run in bounded slots until DONE
for i in $(seq 1 40); do
  timeout 3500 python -u experiments/fig3a_longrun.py --epochs 1250 \
    --num_buckets 10000 --batch_size "$B" --agg "$A" \
    --out results/fig3a_10k >> /tmp/fig3a_10k_r3.log 2>&1
  if grep -q DONE /tmp/fig3a_10k_r3.log; then break; fi
  sleep 2
done
echo "$(date) 10k chain done" >> "$LOG"
