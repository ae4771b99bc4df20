#!/bin/bash
# Round-3 chip chain v3b: v3 minus the completed fused A/B stage.
# v3's first pass raced through on ModuleNotFoundError — the VM reset had
# also wiped the editable install, and most experiment drivers (unlike
# fused_ab.py/bench.py) don't sys.path-insert the repo root. PYTHONPATH is
# exported here so a future reset degrades to a warning, not a silent no-op.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
pip install -e . --no-deps --no-build-isolation -q 2>/dev/null
LOG=/tmp/chip_chain3.log
START=$(date +%s)
TRAIN_DEADLINE=$((START + 8580))   # stop fig3a training slots ~143 min in
echo "$(date) chain v3b start (train deadline +143min)" >> "$LOG"

# 0. chip probe (must init AND execute)
for i in $(seq 1 20); do
  if timeout 240 python -c "import jax; jax.devices(); import jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" >/dev/null 2>&1; then
    break
  fi
  echo "$(date) chip still down" >> "$LOG"
  sleep 120
done
echo "$(date) chip UP" >> "$LOG"

# 2. bptt=2010 batch-shape sweep, one shape per process for isolation
for SHAPE in 4x25 10x10 20x5 25x4 50x2 100x1; do
  timeout 1200 python -u experiments/batch_shape_sweep.py \
    --shapes "$SHAPE" --out results/batch_sweep.json >> /tmp/batch_sweep.log 2>&1
done
cp -f results/batch_sweep.json docs/results/batch_sweep_2010.json 2>/dev/null
echo "$(date) stage2 sweep: $(cat results/batch_sweep.json 2>/dev/null | tr -d '\n')" >> "$LOG"
WINNER=$(python -c "import json; d=json.load(open('results/batch_sweep.json')); print(d['winner'] or '4x25')" 2>/dev/null || echo 4x25)
B=${WINNER%x*}; A=${WINNER#*x}
echo "$(date) adopting batch_size=$B agg=$A" >> "$LOG"

# 3. flash-kernel-under-shard_map on-chip check (VERDICT-7 on real silicon)
timeout 1800 python -u experiments/flash_equivalence.py --sharded \
  >> /tmp/flash_shard.log 2>&1
echo "$(date) stage3 flash-shard rc=$?" >> "$LOG"

# 4. tabular: retrain the 300-epoch reference-suite model from scratch, then
#    evaluate WITH the inference-time ensemble (VERDICT-5 cheap lever).
timeout 5400 python -u experiments/tabular_eval.py --epochs 300 \
  --suite reference --baselines logistic --ensemble 8 \
  --checkpoint results/tabular/pfn_ck_r3 \
  --out results/tabular >> /tmp/tabular_ens.log 2>&1
cp -f results/tabular/summary.json docs/results/tabular_ensemble8_300ep.json 2>/dev/null
echo "$(date) stage4 tabular-ensemble rc=$? $(tail -n1 /tmp/tabular_ens.log)" >> "$LOG"

# 5. the mixture-sampler bptt=2010 run from scratch (VERDICT-4), sweep-winner
#    shape, resumable slots until the deadline.
for i in $(seq 1 40); do
  NOW=$(date +%s)
  LEFT=$((TRAIN_DEADLINE - NOW))
  if [ "$LEFT" -lt 180 ]; then break; fi
  SLOT=$((LEFT < 1700 ? LEFT : 1700))
  timeout "$SLOT" python -u experiments/fig3a_longrun.py --epochs 2500 \
    --eval_pos_sampler mixture --batch_size "$B" --agg "$A" --skip_eval \
    --out results/fig3a_mix >> /tmp/fig3a_mix.log 2>&1
  if grep -q DONE /tmp/fig3a_mix.log; then break; fi
  sleep 2
done
echo "$(date) stage5 mixture training stopped: $(ls results/fig3a_mix/ck 2>/dev/null | tail -n1)" >> "$LOG"

# 6. analytic (Rao-Blackwellized) gap on the mixture checkpoint:
#    phase A chip logits, phase B CPU f64 oracle moments, phase C stats with
#    the 1e-3 met/unmet/unmeasurable verdict + n-for-1e-3 power analysis.
timeout 2400 python -u experiments/fig3a_analytic_gap.py \
  --ck results/fig3a_mix/ck --out results/fig3a_mix/analytic_gap \
  --label "mixture-sampler run" >> /tmp/analytic_gap.log 2>&1
echo "$(date) stage6a analytic-A rc=$?" >> "$LOG"
timeout 3600 python -u experiments/fig3a_analytic_gap.py \
  --out results/fig3a_mix/analytic_gap --moments_pass >> /tmp/analytic_gap.log 2>&1
echo "$(date) stage6b analytic-B rc=$?" >> "$LOG"
timeout 1200 python -u experiments/fig3a_analytic_gap.py \
  --out results/fig3a_mix/analytic_gap --label "mixture-sampler run" \
  --stats_only >> /tmp/analytic_gap.log 2>&1
cp -f results/fig3a_mix/analytic_gap/analytic_gap.json docs/results/analytic_gap_mix.json 2>/dev/null
echo "$(date) stage6c analytic-C rc=$?" >> "$LOG"

# 7. sampled-protocol robust eval of the mixture model (reduced n) for the
#    like-for-like comparison against the committed weighted@5000ep table.
timeout 3000 python -u experiments/fig3a_robust_eval.py \
  --ck results/fig3a_mix/ck --out results/fig3a_mix/robust_eval --chunks 4 \
  --label "mixture" >> /tmp/robust_mix.log 2>&1
cp -f results/fig3a_mix/robust_eval/robust_eval.json docs/results/fig3a_robust_mix.json 2>/dev/null
echo "$(date) stage7 robust-mix rc=$?" >> "$LOG"

# 8. a final bench capture under the committed A/B winner
timeout 1800 python -u bench.py > /tmp/bench_r3.log 2>&1
echo "$(date) stage8 bench rc=$? $(tail -n1 /tmp/bench_r3.log)" >> "$LOG"
echo "$(date) chain v3b COMPLETE" >> "$LOG"
