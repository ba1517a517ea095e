#!/bin/bash
# Round-3 follow-up TPU queue: waits for run_r3_measurements.sh to finish
# (watches its log), then runs the r50 profile, a swin trace with the fused
# kernel, and the recalibrated arcface north-star.
set -u
cd /root/repo
mkdir -p /tmp/r3_runs

while ! grep -q "all done" /tmp/r3_queue.log 2>/dev/null; do sleep 60; done

echo "=== r50_profile: $(date +%H:%M:%S) ==="
timeout 3600 python tools/r50_profile.py > /tmp/r3_runs/r50_profile.log 2>&1
echo "exit=$?"
grep -E "img/s|trace" /tmp/r3_runs/r50_profile.log

echo "=== r50_xplane: $(date +%H:%M:%S) ==="
timeout 900 python tools/analyze_xplane.py /tmp/r50_trace \
  > /tmp/r3_runs/r50_xplane.log 2>&1
echo "exit=$?"

echo "=== arcface_h04: $(date +%H:%M:%S) ==="
timeout 5400 python -m torchok_tpu -cp configs -cn representation_arcface_shapes \
  > /tmp/r3_runs/arcface_h04.log 2>&1
echo "exit=$?"

echo "=== followup done: $(date +%H:%M:%S) ==="
