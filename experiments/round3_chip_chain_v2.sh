#!/bin/bash
# Round-3 chip job chain v2 (run detached with setsid nohup).
# Reprioritized vs v1: short, verdict-critical measurements FIRST so a
# late-returning chip still produces them; long resumable training last.
#   0. wait for the axon TPU backend (UNAVAILABLE since round start)
#   1. analytic-gap phase A for the 5000-epoch model (PFN logits on chip)
#      -> the 1e-3 met/unmet/unmeasurable verdict (stats run on CPU)
#   2. fused-layer A/B (one process, ABA)
#   3. flash-kernel-under-shard_map on-chip check
#   4. bptt=2010 batch-shape sweep (resumable, one shape per process)
#   5. resume the 10k-bucket Fig-3a run with the sweep winner
#   6. mixture-sampler bptt=2010 run from scratch (resumable slots)
#   7. tabular scaling: 1000-epoch point
# Progress: /tmp/chip_chain.log (+ per-stage logs in /tmp)
set -u
cd /root/repo
LOG=/tmp/chip_chain.log
echo "$(date) chain v2 start" >> "$LOG"

# 0. wait for chip (probe must both init the backend AND execute)
while true; do
  if timeout 240 python -c "import jax; jax.devices(); import jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" >/dev/null 2>&1; then
    break
  fi
  echo "$(date) chip still down" >> "$LOG"
  sleep 180
done
echo "$(date) chip UP" >> "$LOG"

# 1. analytic gap, phase A (chip) then phase C stats (CPU f64 subprocess).
#    Resumable; oracle moments (phase B) are already on disk.
timeout 5400 python -u experiments/fig3a_analytic_gap.py \
  --ck results/fig3a/ck --out results/fig3a/analytic_gap \
  --data results/fig3a/robust_eval >> /tmp/analytic_gap.log 2>&1
echo "$(date) stage1 analytic-gap rc=$?" >> "$LOG"

# 2. fused-layer A/B
timeout 2400 python -u experiments/fused_ab.py >> /tmp/fused_ab.log 2>&1
echo "$(date) stage2 fused-ab rc=$? $(tail -n1 /tmp/fused_ab.log)" >> "$LOG"

# 3. flash under shard_map on the real chip (1-device mesh)
timeout 1800 python -u experiments/flash_equivalence.py --sharded \
  >> /tmp/flash_shard.log 2>&1
echo "$(date) stage3 flash-shard rc=$?" >> "$LOG"

# 3.5 tabular inference-time ensemble on the EXISTING 300-epoch model
#     (eval only — the cheap VERDICT-5 lever, independent of retraining).
#     --out results/tabular reuses the cached grid-searched baselines.
timeout 3600 python -u experiments/tabular_eval.py --suite reference \
  --baselines logistic --load results/tabular/pfn_ck_r2 --ensemble 8 \
  --out results/tabular >> /tmp/tabular_ens.log 2>&1
cp -f results/tabular/summary.json docs/results/tabular_ensemble8_300ep.json 2>/dev/null
echo "$(date) stage3.5 tabular-ensemble rc=$? $(tail -n1 /tmp/tabular_ens.log)" >> "$LOG"

# 4. sweep, one shape per process for isolation
for SHAPE in 4x25 10x10 20x5 25x4 50x2 100x1; do
  timeout 1800 python -u experiments/batch_shape_sweep.py \
    --shapes "$SHAPE" --out results/batch_sweep.json >> "$LOG" 2>&1
done
echo "$(date) sweep done: $(cat results/batch_sweep.json 2>/dev/null | tr -d '\n')" >> "$LOG"

WINNER=$(python -c "import json; d=json.load(open('results/batch_sweep.json')); print(d['winner'] or '4x25')" 2>/dev/null || echo 4x25)
B=${WINNER%x*}; A=${WINNER#*x}
echo "$(date) adopting batch_size=$B agg=$A" >> "$LOG"

# 5. resume the 10k run in bounded slots until DONE
for i in $(seq 1 40); do
  timeout 3500 python -u experiments/fig3a_longrun.py --epochs 1250 \
    --num_buckets 10000 --batch_size "$B" --agg "$A" \
    --out results/fig3a_10k >> /tmp/fig3a_10k_r3.log 2>&1
  if grep -q DONE /tmp/fig3a_10k_r3.log; then break; fi
  sleep 2
done
echo "$(date) 10k chain done" >> "$LOG"

# 6. mixture-sampler bptt=2010 run from scratch (one schedule, no finetune):
#    target 2500 epochs, resumable slots, sweep-winner shape.
for i in $(seq 1 40); do
  timeout 3500 python -u experiments/fig3a_longrun.py --epochs 2500 \
    --eval_pos_sampler mixture --batch_size "$B" --agg "$A" \
    --out results/fig3a_mix >> /tmp/fig3a_mix.log 2>&1
  if grep -q DONE /tmp/fig3a_mix.log; then break; fi
  sleep 2
done
echo "$(date) mixture run done" >> "$LOG"

# 7. tabular scaling: the 1000-epoch point on the reference 9-dataset suite
#    (PFN column only needs retraining; cached logistic is the bar)
timeout 14400 python -u experiments/tabular_eval.py --epochs 1000 \
  --suite reference --baselines logistic --ensemble 8 \
  --checkpoint results/tabular/pfn_ck_1000ep \
  --out results/tabular >> /tmp/tabular_1000.log 2>&1
cp -f results/tabular/summary.json docs/results/tabular_tpu1000ep.json 2>/dev/null
echo "$(date) tabular 1000ep rc=$?" >> "$LOG"
echo "$(date) chain v2 COMPLETE" >> "$LOG"
