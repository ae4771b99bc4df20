#!/bin/bash
# Round-4 chip chain, stage 3 — runs after round4_stage2.sh completes.
#
#   H. Tabular prior-diversity A/B (the round-4 epochs-scaling verdict
#      says the tabular gap is prior-limited): 300-epoch ensemble-8 run
#      with --prior mlp_gp_mixture (80% MLP + 20% binarized GP-hyperprior
#      batches) on the reference 9-dataset suite, same protocol as the
#      committed tabular_ensemble8_300ep.json MLP point.
#   R5. With remaining wall clock, START the evidence-backed round-5
#      Fig-3a recipe long run (mixture sampler + 10,000 buckets +
#      bucket_seq_cap 128, 5000 epochs) under durable snapshots — round 5
#      resumes it from slot fig3a-r5.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_PLATFORMS=axon   # fail-fast if the axon backend is down
LOG=/tmp/round4_stage3.log
echo "$(date) stage-3 start" >> "$LOG"

snapshot() {
  local ck_dir=$1 slot=$2 newest cur
  newest=$(find "$ck_dir" -maxdepth 1 -type d -regextype posix-extended \
           -regex '.*/epoch_[0-9]+$' 2>/dev/null | sort -t_ -k2 -n | tail -1)
  [ -z "$newest" ] && return 1
  [ -n "$(find "$newest" -newermt '-20 seconds' -print -quit)" ] && return 1
  cur=$(git ls-tree --name-only "refs/heads/ckpt-$slot" snap/ 2>/dev/null | head -1)
  [ "$cur" = "snap/$(basename "$newest")" ] && return 0
  bash experiments/durable_ckpt.sh save "$slot" "$newest" >> "$LOG" 2>&1
}

restore_if_empty() {
  local ck_dir=$1 slot=$2
  if ! ls -d "$ck_dir"/epoch_* >/dev/null 2>&1; then
    mkdir -p "$ck_dir"
    bash experiments/durable_ckpt.sh restore "$slot" "$ck_dir" >> "$LOG" 2>&1 \
      && echo "$(date) restored $slot -> $ck_dir: $(ls "$ck_dir")" >> "$LOG"
  fi
}

commit_artifact() {  # $1 src, $2 dst, $3 message
  cp -f "$1" "$2" || return 1
  git add "$2" && git commit -q -m "$3"
  echo "$(date) committed $2 rc=$?" >> "$LOG"
}

for i in $(seq 1 10); do
  if timeout 300 python -c "import jax; jax.devices(); import jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" >/dev/null 2>&1; then
    break
  fi
  echo "$(date) chip still down" >> "$LOG"
  sleep 60
done
echo "$(date) chip UP" >> "$LOG"

# ---- H: tabular prior-diversity A/B (mlp_gp_mixture, 300ep, ens-8) -----
if [ ! -f docs/results/tabular_mix300_summary.json ]; then
  restore_if_empty results/tabular_mix300/ck tabular-mix300
  for i in 1 2 3; do
    ( while [ ! -f /tmp/tabular-mix300.done ]; do sleep 240; snapshot results/tabular_mix300/ck tabular-mix300; done ) &
    SIDE=$!
    timeout 2400 python -u experiments/tabular_eval.py --epochs 300 \
      --ensemble 8 --prior mlp_gp_mixture --out results/tabular_mix300 \
      --checkpoint_dir results/tabular_mix300/ck \
      >> /tmp/tabular_mix300.log 2>&1
    echo "$(date) tabmix slot $i rc=$? last: $(tail -n1 /tmp/tabular_mix300.log)" >> "$LOG"
    touch /tmp/tabular-mix300.done; wait "$SIDE" 2>/dev/null; rm -f /tmp/tabular-mix300.done
    snapshot results/tabular_mix300/ck tabular-mix300
    [ -f results/tabular_mix300/summary.json ] && break
    sleep 2
  done
  [ -f results/tabular_mix300/summary.json ] \
    && commit_artifact results/tabular_mix300/summary.json \
         docs/results/tabular_mix300_summary.json \
         "Tabular prior-diversity A/B: mlp_gp_mixture 300ep ensemble-8 summary"
fi

# ---- R5: start the round-5 recipe long run (resumable across rounds) ----
OUT=results/fig3a_r5
if [ ! -f docs/results/analytic_gap_r5.json ]; then
  restore_if_empty "$OUT/ck" fig3a-r5
  for i in $(seq 1 12); do
    ( while [ ! -f /tmp/fig3a-r5.done ]; do sleep 240; snapshot "$OUT/ck" fig3a-r5; done ) &
    SIDE=$!
    timeout 3000 python -u experiments/fig3a_longrun.py --out "$OUT" \
      --epochs 5000 --eval_pos_sampler mixture \
      --num_buckets 10000 --bucket_seq_cap 128 \
      >> /tmp/fig3a-r5.log 2>&1
    echo "$(date) fig3a-r5 slot $i rc=$? last: $(tail -n1 /tmp/fig3a-r5.log)" >> "$LOG"
    touch /tmp/fig3a-r5.done; wait "$SIDE" 2>/dev/null; rm -f /tmp/fig3a-r5.done
    snapshot "$OUT/ck" fig3a-r5
    [ -f "$OUT/curves.json" ] && break
    sleep 2
  done
fi

echo "$(date) stage-3 COMPLETE" >> "$LOG"
