#!/bin/bash
# Round-4 (or any later session) chip chain: the two measurements that
# could not fit in round-3's chip budget, both resumable from durable
# git-committed state:
#
#   A. Rao-Blackwellized analytic-gap pipeline on the mixture-sampler
#      500-epoch checkpoint (VERDICT-1's met/unmet/unmeasurable verdict
#      for the 1e-3 north star, on the round-3 VERDICT-4 model). Restores
#      the checkpoint from ckpts/fig3a_mix500 (committed by
#      round3_session3_chain.sh) if results/ was wiped by a VM reset.
#   B. Tabular epochs-scaling point (VERDICT-5): 1000-epoch meta-training
#      on the reference 9-dataset suite with the ensemble-8 inference,
#      vs the committed 300-epoch artifacts.
#
# Each artifact is copied into docs/results/ and committed as it lands.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/tmp/round4_chain.log
echo "$(date) round-4 chain start" >> "$LOG"

# chip probe (must init AND execute; idle host required for init)
for i in $(seq 1 10); do
  if timeout 240 python -c "import jax; jax.devices(); import jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" >/dev/null 2>&1; then
    break
  fi
  echo "$(date) chip still down" >> "$LOG"
  sleep 60
done
echo "$(date) chip UP" >> "$LOG"

# ---- A: analytic gap on the mixture checkpoint -------------------------
OUT=results/fig3a_mix500
if [ ! -d "$OUT/ck" ] && [ -d ckpts/fig3a_mix500/ck ]; then
  mkdir -p "$OUT"
  cp -r ckpts/fig3a_mix500/ck "$OUT/ck"
  echo "$(date) restored mixture ck from git: $(ls $OUT/ck)" >> "$LOG"
fi
if [ -d "$OUT/ck" ] && [ ! -f docs/results/analytic_gap_mix500.json ]; then
  timeout 1500 python -u experiments/fig3a_analytic_gap.py \
    --ck "$OUT/ck" --out "$OUT/analytic_gap" \
    --chunks 4 --label "mixture-sampler 500ep" >> "$LOG" 2>&1
  echo "$(date) analytic phase A rc=$?" >> "$LOG"
  timeout 2400 python -u experiments/fig3a_analytic_gap.py \
    --out "$OUT/analytic_gap" --moments_pass >> "$LOG" 2>&1
  echo "$(date) analytic phase B rc=$?" >> "$LOG"
  timeout 600 python -u experiments/fig3a_analytic_gap.py \
    --out "$OUT/analytic_gap" --stats_only \
    --label "mixture-sampler 500ep" >> "$LOG" 2>&1
  echo "$(date) analytic phase C rc=$?" >> "$LOG"
  if [ -f "$OUT/analytic_gap/analytic_gap.json" ]; then
    cp -f "$OUT/analytic_gap/analytic_gap.json" docs/results/analytic_gap_mix500.json
    git add docs/results/analytic_gap_mix500.json
    git commit -q -m "Analytic (Rao-Blackwellized) Fig-3a gap for the mixture-sampler run"
    echo "$(date) analytic gap committed" >> "$LOG"
  fi
fi

# ---- B: tabular 1000-epoch scaling point -------------------------------
if [ ! -f docs/results/tabular_ensemble8_1000ep.json ]; then
  if [ ! -d results/tabular_1000ep/ck ] && [ -d ckpts/tabular_1000ep/ck ]; then
    mkdir -p results/tabular_1000ep
    cp -r ckpts/tabular_1000ep/ck results/tabular_1000ep/ck
    echo "$(date) restored tabular ck from git: $(ls results/tabular_1000ep/ck)" >> "$LOG"
  fi
  for i in 1 2 3 4; do
    timeout 2400 python -u experiments/tabular_eval.py --epochs 1000 \
      --ensemble 8 --out results/tabular_1000ep \
      --checkpoint_dir results/tabular_1000ep/ck \
      >> /tmp/tabular_1000ep.log 2>&1
    RC=$?
    echo "$(date) tabular slot $i rc=$RC last: $(tail -n1 /tmp/tabular_1000ep.log)" >> "$LOG"
    # durable snapshot of the newest quiescent checkpoint after each slot
    newest=$(ls -d results/tabular_1000ep/ck/epoch_* 2>/dev/null | sort -t_ -k2 -n | tail -1)
    if [ -n "$newest" ] && [ ! -d "ckpts/tabular_1000ep/ck/$(basename $newest)" ]; then
      mkdir -p ckpts/tabular_1000ep/ck
      rm -rf ckpts/tabular_1000ep/ck/epoch_*
      cp -r "$newest" "ckpts/tabular_1000ep/ck/$(basename $newest)"
      git add -A ckpts/tabular_1000ep
      git commit -q -m "Durable checkpoint: tabular 1000ep $(basename $newest)"
    fi
    if [ -f results/tabular_1000ep/summary.json ]; then break; fi
    sleep 2
  done
  if [ -f results/tabular_1000ep/summary.json ]; then
    cp -f results/tabular_1000ep/summary.json docs/results/tabular_ensemble8_1000ep.json
    git add docs/results/tabular_ensemble8_1000ep.json
    git commit -q -m "Tabular epochs-scaling: 1000-epoch point with ensemble-8 inference"
    echo "$(date) tabular scaling point committed" >> "$LOG"
  fi
fi
echo "$(date) round-4 chain COMPLETE" >> "$LOG"
