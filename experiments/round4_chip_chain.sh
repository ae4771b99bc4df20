#!/bin/bash
# Round-4 chip chain — resumable from durable git state at every phase.
# Safe to re-run from scratch (each phase is guarded by its artifact).
#
#   A. Finish the mixture-sampler 500-epoch run (epoch 460 -> 500), eval
#      curves, and the Rao-Blackwellized analytic-gap pipeline (VERDICT-1).
#   B. Matched-budget weighted 500-epoch run + analytic gap, for the
#      apples-to-apples mixture-vs-weighted analytic A/B.
#   D. Tabular 1000-epoch scaling point with ensemble-8 (VERDICT-3).
#   C. 10,000-bucket Fig-3a grid point (VERDICT-2), >= 1250 epochs.
#      (D before C: C is the longest phase and resumable across rounds.)
#
# Durability (round-3 VERDICT-4 / ADVICE items 2+5 fix): checkpoints are
# snapshotted with experiments/durable_ckpt.sh onto force-updated
# refs/heads/ckpt-* roots — bounded history, nothing >10 MB ever lands on
# main. Snapshot staging is tmp-copy + atomic ref update inside the tool;
# quiescence is checked RECURSIVELY and names are filtered to epoch_[0-9]+
# (ADVICE item 1 fix).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
# KEEP the JAX_PLATFORMS=axon pin. The axon register() in sitecustomize can
# fail transiently under host contention; with the pin the process
# FAIL-FASTS ("Backend 'axon' is not in the list of known backends") and the
# slot loop retries — without it jax silently falls back to the CPU backend
# and a bptt=2010 epoch takes hours instead of 4 s (measured the hard way,
# round 4). Start chip processes only on an idle host.
export JAX_PLATFORMS=axon
LOG=/tmp/round4_chain.log
echo "$(date) round-4 chain start" >> "$LOG"

# Snapshot the newest quiescent epoch_N under $1 to durable slot $2.
snapshot() {
  local ck_dir=$1 slot=$2 newest cur
  newest=$(find "$ck_dir" -maxdepth 1 -type d -regextype posix-extended \
           -regex '.*/epoch_[0-9]+$' 2>/dev/null | sort -t_ -k2 -n | tail -1)
  [ -z "$newest" ] && return 1
  # quiescent = nothing anywhere under it written in the last 20 s
  [ -n "$(find "$newest" -newermt '-20 seconds' -print -quit)" ] && return 1
  cur=$(git ls-tree --name-only "refs/heads/ckpt-$slot" snap/ 2>/dev/null | head -1)
  [ "$cur" = "snap/$(basename "$newest")" ] && return 0
  bash experiments/durable_ckpt.sh save "$slot" "$newest" >> "$LOG" 2>&1
}

# Restore durable slot $2 into $1 if $1 has no checkpoints.
restore_if_empty() {
  local ck_dir=$1 slot=$2
  if ! ls -d "$ck_dir"/epoch_* >/dev/null 2>&1; then
    mkdir -p "$ck_dir"
    bash experiments/durable_ckpt.sh restore "$slot" "$ck_dir" >> "$LOG" 2>&1 \
      && echo "$(date) restored $slot -> $ck_dir: $(ls "$ck_dir")" >> "$LOG"
  fi
}

commit_artifact() {  # $1 src, $2 dst (docs/results/...), $3 message
  cp -f "$1" "$2" || return 1
  git add "$2" && git commit -q -m "$3"
  echo "$(date) committed $2 rc=$?" >> "$LOG"
}

# chip probe (must init AND execute; idle host required for init)
for i in $(seq 1 10); do
  if timeout 300 python -c "import jax; jax.devices(); import jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" >/dev/null 2>&1; then
    break
  fi
  echo "$(date) chip still down" >> "$LOG"
  sleep 60
done
echo "$(date) chip UP" >> "$LOG"

run_longrun() {  # $1 out_dir, $2 slot, $3 slots, extra args...
  local out=$1 slot=$2 nslots=$3; shift 3
  restore_if_empty "$out/ck" "$slot"
  for i in $(seq 1 "$nslots"); do
    ( while [ ! -f "/tmp/$slot.done" ]; do sleep 240; snapshot "$out/ck" "$slot"; done ) &
    local side=$!
    timeout 3000 python -u experiments/fig3a_longrun.py --out "$out" "$@" \
      >> "/tmp/$slot.log" 2>&1
    echo "$(date) $slot slot $i rc=$? last: $(tail -n1 "/tmp/$slot.log")" >> "$LOG"
    touch "/tmp/$slot.done"; wait "$side" 2>/dev/null; rm -f "/tmp/$slot.done"
    snapshot "$out/ck" "$slot"
    [ -f "$out/curves.json" ] && return 0
    sleep 2
  done
  [ -f "$out/curves.json" ]
}

run_analytic() {  # $1 out_dir, $2 label, extra args...
  local out=$1 label=$2; shift 2
  timeout 2400 python -u experiments/fig3a_analytic_gap.py \
    --ck "$out/ck" --out "$out/analytic_gap" --chunks 4 --label "$label" "$@" \
    >> "$LOG" 2>&1
  echo "$(date) analytic($label) A rc=$?" >> "$LOG"
  timeout 3600 python -u experiments/fig3a_analytic_gap.py \
    --out "$out/analytic_gap" --moments_pass >> "$LOG" 2>&1
  echo "$(date) analytic($label) B rc=$?" >> "$LOG"
  timeout 600 python -u experiments/fig3a_analytic_gap.py \
    --out "$out/analytic_gap" --stats_only --label "$label" >> "$LOG" 2>&1
  echo "$(date) analytic($label) C rc=$?" >> "$LOG"
  [ -f "$out/analytic_gap/analytic_gap.json" ]
}

# ---- A: finish mixture run + curves + analytic gap ---------------------
OUT=results/fig3a_mix500
if [ ! -f docs/results/fig3a_mix_500ep.json ]; then
  run_longrun "$OUT" fig3a-mix500 4 --epochs 500 --eval_pos_sampler mixture \
    && commit_artifact "$OUT/curves.json" docs/results/fig3a_mix_500ep.json \
         "Fig-3a mixture-sampler 500ep: positional gap curves"
fi
if [ -f docs/results/fig3a_mix_500ep.json ] && [ ! -f docs/results/analytic_gap_mix500.json ]; then
  run_analytic "$OUT" "mixture-sampler 500ep" \
    && commit_artifact "$OUT/analytic_gap/analytic_gap.json" \
         docs/results/analytic_gap_mix500.json \
         "Analytic (Rao-Blackwellized) Fig-3a gap for the mixture-sampler run"
fi

# ---- B: matched-budget weighted 500ep + analytic gap -------------------
OUT=results/fig3a_w500
if [ ! -f docs/results/analytic_gap_w500.json ]; then
  run_longrun "$OUT" fig3a-w500 4 --epochs 500 --eval_pos_sampler weighted
  if [ -f "$OUT/curves.json" ]; then
    commit_artifact "$OUT/curves.json" docs/results/fig3a_w500_curves.json \
      "Fig-3a weighted 500ep rerun (matched budget for the mixture A/B)"
    run_analytic "$OUT" "weighted 500ep" \
      && commit_artifact "$OUT/analytic_gap/analytic_gap.json" \
           docs/results/analytic_gap_w500.json \
           "Analytic Fig-3a gap for the matched-budget weighted run"
  fi
fi

# ---- D: tabular 1000-epoch scaling point -------------------------------
if [ ! -f docs/results/tabular_ensemble8_1000ep.json ]; then
  restore_if_empty results/tabular_1000ep/ck tabular-1000ep
  for i in 1 2 3 4; do
    ( while [ ! -f /tmp/tabular-1000ep.done ]; do sleep 240; snapshot results/tabular_1000ep/ck tabular-1000ep; done ) &
    SIDE=$!
    timeout 2400 python -u experiments/tabular_eval.py --epochs 1000 \
      --ensemble 8 --out results/tabular_1000ep \
      --checkpoint_dir results/tabular_1000ep/ck \
      >> /tmp/tabular_1000ep.log 2>&1
    echo "$(date) tabular slot $i rc=$? last: $(tail -n1 /tmp/tabular_1000ep.log)" >> "$LOG"
    touch /tmp/tabular-1000ep.done; wait "$SIDE" 2>/dev/null; rm -f /tmp/tabular-1000ep.done
    snapshot results/tabular_1000ep/ck tabular-1000ep
    [ -f results/tabular_1000ep/summary.json ] && break
    sleep 2
  done
  [ -f results/tabular_1000ep/summary.json ] \
    && commit_artifact results/tabular_1000ep/summary.json \
         docs/results/tabular_ensemble8_1000ep.json \
         "Tabular epochs-scaling: 1000-epoch point with ensemble-8 inference"
fi
# ---- C: 10,000-bucket grid point (>=1250 epochs) -----------------------
OUT=results/fig3a_10kbuckets
if [ ! -f docs/results/analytic_gap_10kbuckets.json ]; then
  run_longrun "$OUT" fig3a-10kb 8 --epochs 1250 --num_buckets 10000 \
    --eval_pos_sampler weighted
  if [ -f "$OUT/curves.json" ]; then
    commit_artifact "$OUT/curves.json" docs/results/fig3a_10kbuckets_1250ep.json \
      "Fig-3a 10,000-bucket grid point at 1250 epochs"
    run_analytic "$OUT" "10k buckets 1250ep" --num_buckets 10000 \
      && commit_artifact "$OUT/analytic_gap/analytic_gap.json" \
           docs/results/analytic_gap_10kbuckets.json \
           "Analytic Fig-3a gap: 10,000-bucket head at 1250 epochs"
  fi
fi

echo "$(date) round-4 chain COMPLETE" >> "$LOG"
