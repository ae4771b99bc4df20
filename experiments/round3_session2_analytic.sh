#!/bin/bash
# Watcher: once the mixture-sampler 500-epoch run finishes (curves.json
# present), run the Rao-Blackwellized analytic-gap pipeline on its
# checkpoint (VERDICT-1's met/unmet/unmeasurable verdict artifact):
# phase A chip logits, phase B f64 CPU oracle moments, phase C stats.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/tmp/session2_analytic.log
echo "$(date) analytic watcher start" >> "$LOG"
for i in $(seq 1 240); do
  [ -f results/fig3a_mix500/curves.json ] && break
  sleep 15
done
if [ ! -f results/fig3a_mix500/curves.json ]; then
  echo "$(date) curves never appeared; giving up" >> "$LOG"
  exit 1
fi
echo "$(date) curves present; starting analytic gap" >> "$LOG"
timeout 1500 python -u experiments/fig3a_analytic_gap.py \
  --ck results/fig3a_mix500/ck --out results/fig3a_mix500/analytic_gap \
  --chunks 4 --label "mixture-sampler 500ep" >> "$LOG" 2>&1
echo "$(date) phase A rc=$?" >> "$LOG"
timeout 1800 python -u experiments/fig3a_analytic_gap.py \
  --out results/fig3a_mix500/analytic_gap --moments_pass >> "$LOG" 2>&1
echo "$(date) phase B rc=$?" >> "$LOG"
timeout 600 python -u experiments/fig3a_analytic_gap.py \
  --out results/fig3a_mix500/analytic_gap --stats_only \
  --label "mixture-sampler 500ep" >> "$LOG" 2>&1
echo "$(date) phase C rc=$?" >> "$LOG"
cp -f results/fig3a_mix500/analytic_gap/analytic_gap.json \
  docs/results/analytic_gap_mix500.json 2>/dev/null
echo "$(date) analytic watcher COMPLETE" >> "$LOG"
