#!/bin/bash
# Round-3 session-3 chip chain: the VERDICT-4 mixture-sampler run, third
# attempt — the two previous attempts were lost to VM resets because every
# checkpoint lived in the gitignored results/ tree. This chain makes the
# run durable: a sidecar loop commits the newest quiescent orbax
# checkpoint (git add -f) every few minutes, so any future session resumes
# from git instead of from scratch.
#
# Phases:
#   0. restore any committed checkpoint into results/fig3a_mix500/ck
#   1. train bptt=2010 from scratch, mixture eval-pos sampler, 500 epochs,
#      sweep-winner 25x4 shape, resumable slots
#   2. positional eval (chip phase A + f64 CPU oracle phase B) -> curves
#   3. Rao-Blackwellized analytic-gap pipeline on the final checkpoint
# Artifacts are copied to docs/results/ and committed as each lands.
# DEPRECATED (round 4): superseded by experiments/round4_chip_chain.sh +
# experiments/durable_ckpt.sh, which fix this script's known defects
# (ADVICE.md round 3): tmp-dir-matching quiescence glob, non-recursive
# mtime check, unserialized concurrent git add/commit, and unbounded
# checkpoint-blob history on main. Kept for the round-3 record; do not run.
exit 0

set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/tmp/session3_chain.log
OUT=results/fig3a_mix500
echo "$(date) session-3 chain start" >> "$LOG"

# ---- phase 0: restore committed checkpoints, if any --------------------
if [ -d ckpts/fig3a_mix500/ck ] && [ ! -d "$OUT/ck" ]; then
  mkdir -p "$OUT"
  cp -r ckpts/fig3a_mix500/ck "$OUT/ck"
  echo "$(date) restored committed checkpoint: $(ls $OUT/ck)" >> "$LOG"
fi

# ---- durability sidecar ------------------------------------------------
(
  while [ ! -f /tmp/session3_chain.done ]; do
    sleep 240
    newest=$(ls -d "$OUT"/ck/epoch_* 2>/dev/null | sort -t_ -k2 -n | tail -1)
    [ -z "$newest" ] && continue
    # only snapshot a quiescent dir (no writes in the last 20 s)
    age=$(( $(date +%s) - $(stat -c %Y "$newest") ))
    if [ "$age" -lt 20 ]; then
      newest=$(ls -d "$OUT"/ck/epoch_* 2>/dev/null | sort -t_ -k2 -n | tail -2 | head -1)
      [ -z "$newest" ] && continue
    fi
    name=$(basename "$newest")
    if [ ! -d "ckpts/fig3a_mix500/ck/$name" ]; then
      mkdir -p ckpts/fig3a_mix500/ck
      rm -rf ckpts/fig3a_mix500/ck/epoch_* 2>/dev/null
      cp -r "$newest" "ckpts/fig3a_mix500/ck/$name.tmp" && \
        mv "ckpts/fig3a_mix500/ck/$name.tmp" "ckpts/fig3a_mix500/ck/$name"
      git add -A ckpts/ >/dev/null 2>&1
      git commit -q -m "Durable checkpoint: fig3a mixture run $name" >/dev/null 2>&1
      echo "$(date) committed $name" >> "$LOG"
    fi
  done
) &
SIDECAR=$!

# ---- phase 1: train ----------------------------------------------------
for i in 1 2 3 4; do
  timeout 2400 python -u experiments/fig3a_longrun.py --epochs 500 \
    --eval_pos_sampler mixture --out "$OUT" \
    >> /tmp/fig3a_mix500.log 2>&1
  RC=$?
  echo "$(date) slot $i rc=$RC last: $(tail -n1 /tmp/fig3a_mix500.log)" >> "$LOG"
  if [ -f "$OUT/curves.json" ]; then break; fi
  sleep 2
done

if [ -f "$OUT/curves.json" ]; then
  cp -f "$OUT/curves.json" docs/results/fig3a_mix_500ep.json
  git add docs/results/fig3a_mix_500ep.json >/dev/null 2>&1
  git commit -q -m "Fig-3a mixture-sampler 500ep: positional gap curves" >/dev/null 2>&1
  echo "$(date) curves committed" >> "$LOG"
fi

# ---- phase 3: analytic gap on the final checkpoint ---------------------
if [ -f "$OUT/curves.json" ]; then
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
    git add docs/results/analytic_gap_mix500.json >/dev/null 2>&1
    git commit -q -m "Analytic (Rao-Blackwellized) Fig-3a gap for the mixture-sampler run" >/dev/null 2>&1
  fi
fi

touch /tmp/session3_chain.done
wait $SIDECAR 2>/dev/null
echo "$(date) chain COMPLETE" >> "$LOG"
