#!/bin/bash
# Round-4 serial TPU measurement queue (only ONE process may hold the chip).
# Logs under /tmp/r4_runs. Order: shortest/highest-leverage first so a dying
# tunnel costs the least.
set -u
cd /root/repo
mkdir -p /tmp/r4_runs

# 1. fused matmul+BN-stats kernel A/B on the ResNet-50 bottleneck 1x1 shapes
#    (gates whether the kernel is worth integrating into the conv pipeline)
for stage in 3 4; do
  echo "=== probe_conv_bn stage$stage: $(date +%H:%M:%S) ==="
  timeout 2700 python tools/probe_conv_bn.py --stage "$stage" \
    > "/tmp/r4_runs/conv_bn_s$stage.log" 2>&1
  echo "exit=$?"; tail -6 "/tmp/r4_runs/conv_bn_s$stage.log"
done

# 2. bench with the 3 newly added CNN-family rows (efficientnet_b0,
#    mobilenetv3_large_100, hrnet_w18) — perf evidence for 9/9 families
echo "=== bench: $(date +%H:%M:%S) ==="
timeout 9000 python bench.py > /tmp/r4_runs/bench.log 2>&1
echo "exit=$?"; tail -1 /tmp/r4_runs/bench.log

# 3. production-scale IVF (200k x 64): recall vs exact, memory high-water
echo "=== probe_ivf_scale: $(date +%H:%M:%S) ==="
timeout 2700 python tools/probe_ivf_scale.py --rows 200000 --dim 64 \
  > /tmp/r4_runs/ivf_scale.log 2>&1
echo "exit=$?"; grep -E "IVF_SCALE|HitAtK" /tmp/r4_runs/ivf_scale.log

# 4. DETR toy north-star, 300-epoch schedule + grad clip (VERDICT #5)
echo "=== detr_toy_300ep: $(date +%H:%M:%S) ==="
timeout 10800 python -m torchok_tpu -cp configs -cn detection_toy_detr \
  > /tmp/r4_runs/detr_toy.log 2>&1
echo "exit=$?"; grep -E "^epoch" /tmp/r4_runs/detr_toy.log | tail -3

echo "=== all done: $(date +%H:%M:%S) ==="
