#!/bin/bash
# Round-3 session-2 chip chain: the VERDICT-4 measurement that the earlier
# chain lost to a VM reset — train the bptt=2010 Fig-3a config FROM SCRATCH
# with the train-time mixture eval-pos sampler (0.9*weighted +
# 0.1*uniform-capped-300) for 500 epochs at the sweep-winner 25x4 shape,
# then run the standard positional eval (chip phase A + f64 CPU oracle
# phase B). 500 epochs makes the comparison like-for-like against the
# committed weighted@500ep artifact (docs/results/fig3a_500ep.json): the
# mixture run must cut the starved ctx<=50 gaps without hurting ctx>=400.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
pip install -e . --no-deps --no-build-isolation -q 2>/dev/null
LOG=/tmp/session2_chain.log
echo "$(date) session-2 chain start" >> "$LOG"

# chip probe (must init AND execute)
for i in $(seq 1 10); do
  if timeout 240 python -c "import jax; jax.devices(); import jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" >/dev/null 2>&1; then
    break
  fi
  echo "$(date) chip still down" >> "$LOG"
  sleep 60
done
echo "$(date) chip UP" >> "$LOG"

# mixture-sampler from-scratch run, resumable slots (eval fires in the slot
# that reaches the target epoch count)
for i in 1 2 3; do
  timeout 2300 python -u experiments/fig3a_longrun.py --epochs 500 \
    --eval_pos_sampler mixture --out results/fig3a_mix500 \
    >> /tmp/fig3a_mix500.log 2>&1
  RC=$?
  echo "$(date) slot $i rc=$RC last: $(tail -n1 /tmp/fig3a_mix500.log)" >> "$LOG"
  if [ -f results/fig3a_mix500/curves.json ]; then break; fi
  sleep 2
done
cp -f results/fig3a_mix500/curves.json docs/results/fig3a_mix_500ep.json 2>/dev/null
echo "$(date) chain COMPLETE curves=$(ls results/fig3a_mix500/curves.json 2>/dev/null)" >> "$LOG"
