#!/bin/bash
# Round-4d serial TPU measurement queue:
#  1. EfficientNet/MobileNetV3 bf16-precast A/B (the lever the round-4
#     xplane attribution points at: continuous small f32 weight copies)
#  2. DETR toy 300-epoch rerun WITH best-checkpoint saving (so the 0.79
#     plateau can be diagnosed offline from real predictions)
#  3. Record the short-budget north-star baselines (fills the null "short"
#     rows in tools/north_star_baselines.json so the fast gate gates)
set -u
cd /root/repo
mkdir -p /tmp/r4_runs

echo "=== tpu probe: $(date +%H:%M:%S) ==="
timeout 120 python -c "import jax; print(jax.devices())" \
  > /tmp/r4_runs/probe_r4d.log 2>&1
if [ $? -ne 0 ]; then
  echo "TPU unreachable, aborting queue"; exit 1
fi

echo "=== effnet precast A/B: $(date +%H:%M:%S) ==="
timeout 3600 python tools/probe_effnet_levers.py \
  > /tmp/r4_runs/effnet_levers.log 2>&1
echo "exit=$?"
tail -6 /tmp/r4_runs/effnet_levers.log

echo "=== detr_toy_300ep + ckpt: $(date +%H:%M:%S) ==="
timeout 10800 python -m torchok_tpu -cp configs -cn detection_toy_detr \
  > /tmp/r4_runs/detr_toy_ckpt.log 2>&1
echo "exit=$?"

echo "=== north-star short-budget record: $(date +%H:%M:%S) ==="
timeout 14400 python tools/check_north_stars.py --budget short --record \
  > /tmp/r4_runs/north_star_short.log 2>&1
echo "exit=$?"
tail -20 /tmp/r4_runs/north_star_short.log

echo "=== r4d all done: $(date +%H:%M:%S) ==="
