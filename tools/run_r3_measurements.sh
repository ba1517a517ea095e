#!/bin/bash
# Round-3 serial TPU measurement queue (only ONE process may hold the chip).
# Each run logs under /tmp/r3_runs; summary greps at the end of each log.
set -u
cd /root/repo
mkdir -p /tmp/r3_runs

run() {
  name="$1"; shift
  echo "=== $name: $(date +%H:%M:%S) ==="
  timeout 5400 python -m torchok_tpu "$@" > "/tmp/r3_runs/$name.log" 2>&1
  echo "exit=$? $(date +%H:%M:%S)"
  grep -E "^epoch" "/tmp/r3_runs/$name.log" | tail -3
}

# 1. bench with the fused swin kernel now the TPU default
echo "=== bench: $(date +%H:%M:%S) ==="
timeout 3600 python bench.py > /tmp/r3_runs/bench.log 2>&1
echo "exit=$?"; tail -1 /tmp/r3_runs/bench.log

# 2. hardened classification north-star (30 epochs)
run classification_shapes -cp configs -cn classification_shapes

# 3. hardened retrieval north-star
run arcface_shapes -cp configs -cn representation_arcface_shapes

# 4. DETR toy north-star (150 epochs)
run detr_toy -cp configs -cn detection_toy_detr

# 5. RFP quality delta: pyramid-only refinement vs true recursion
run fcos_rfp_pyramid -cp configs -cn detection_toy_fcos \
  task.params.neck_name=RFP \
  'task.params.neck_params={out_channels: 64, num_outs: 3, rfp_steps: 2}'
run fcos_rfp_recursive -cp configs -cn detection_toy_fcos \
  task.params.neck_name=RFP \
  'task.params.neck_params={out_channels: 64, num_outs: 3, rfp_steps: 2, rfp_backbone_name: resnet18}'

echo "=== all done: $(date +%H:%M:%S) ==="
