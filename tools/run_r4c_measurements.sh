#!/bin/bash
# Round-4c serial TPU measurement queue: the two jobs the previous session
# lost when it died — the EfficientNet MFU attribution probe (worst family
# in BENCH r4: 6.0% MFU) and the DETR toy 300-epoch north-star rerun.
set -u
cd /root/repo
mkdir -p /tmp/r4_runs

# 0. fail fast if the tunnel is dead (jax.devices() can hang for hours)
echo "=== tpu probe: $(date +%H:%M:%S) ==="
timeout 120 python -c "import jax; print(jax.devices())" \
  > /tmp/r4_runs/probe_r4c.log 2>&1
if [ $? -ne 0 ]; then
  echo "TPU unreachable, aborting queue"; exit 1
fi

# 1. EfficientNet-B0 attribution: xplane trace + bs A/B (VERDICT #2 tail)
echo "=== effnet profile: $(date +%H:%M:%S) ==="
timeout 3600 python tools/probe_effnet_profile.py \
  > /tmp/r4_runs/effnet_profile.log 2>&1
echo "exit=$?"
timeout 600 python tools/analyze_xplane.py /tmp/effnet_trace \
  > /tmp/r4_runs/effnet_xplane.log 2>&1
echo "xplane exit=$?"
tail -5 /tmp/r4_runs/effnet_profile.log

# 2. DETR toy north-star, 300-epoch schedule + grad clip (VERDICT #5)
echo "=== detr_toy_300ep: $(date +%H:%M:%S) ==="
timeout 10800 python -m torchok_tpu -cp configs -cn detection_toy_detr \
  > /tmp/r4_runs/detr_toy.log 2>&1
echo "exit=$?"
grep -E "mAP|map" /tmp/r4_runs/detr_toy.log | tail -5

echo "=== r4c all done: $(date +%H:%M:%S) ==="
