#!/bin/bash
# Round-4e serial TPU measurement queue (restart of the r4d tail that died
# with the previous session):
#  1. DETR toy 300-epoch rerun WITH best-checkpoint saving (so the 0.79
#     plateau can be diagnosed offline from real predictions)
#  2. Record the short-budget north-star baselines (fills the null "short"
#     rows in tools/north_star_baselines.json so the fast gate gates)
set -u
cd /root/repo
mkdir -p /tmp/r4_runs

echo "=== tpu probe: $(date +%H:%M:%S) ==="
timeout 120 python -c "import jax; print(jax.devices())" \
  > /tmp/r4_runs/probe_r4e.log 2>&1
if [ $? -ne 0 ]; then
  echo "TPU unreachable, aborting queue"; exit 1
fi

echo "=== detr_toy_300ep + ckpt: $(date +%H:%M:%S) ==="
timeout 10800 python -m torchok_tpu -cp configs -cn detection_toy_detr \
  > /tmp/r4_runs/detr_toy_ckpt.log 2>&1
echo "exit=$?"
grep -o "valid/map50[^,}]*" /tmp/r4_runs/detr_toy_ckpt.log | tail -3

echo "=== north-star short-budget record: $(date +%H:%M:%S) ==="
timeout 14400 python tools/check_north_stars.py --budget short --record \
  > /tmp/r4_runs/north_star_short.log 2>&1
echo "exit=$?"
tail -20 /tmp/r4_runs/north_star_short.log

echo "=== r4e all done: $(date +%H:%M:%S) ==="
