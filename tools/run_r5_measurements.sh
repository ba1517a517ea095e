#!/bin/bash
# Round-5 serial TPU measurement queue (start AFTER the DETR q64 300-ep run
# releases the chip):
#  1. diagnose the q64 DETR plateau from the new best checkpoint
#  2. fused-MBConv Pallas probe (VERDICT r4 #4)
#  3. ResNet-50 implicit-GEMM conv probe (VERDICT r4 #5)
#  4. re-record the DETR short-budget gate at the flatter 100-ep point
#     (VERDICT r4 #8)
#  5. bench.py — fresh headline numbers + warms the compile cache so the
#     driver's end-of-round bench emits full extras
set -u
cd /root/repo
mkdir -p /tmp/r5_runs

echo "=== tpu probe: $(date +%H:%M:%S) ==="
timeout 120 python -c "import jax; print(jax.devices())" \
  > /tmp/r5_runs/probe.log 2>&1 || { echo "TPU unreachable"; exit 1; }

echo "=== diagnose_detr: $(date +%H:%M:%S) ==="
timeout 2400 python tools/diagnose_detr.py > /tmp/r5_runs/diagnose_detr.log 2>&1
echo "exit=$?"; tail -25 /tmp/r5_runs/diagnose_detr.log

echo "=== probe_mbconv_fused: $(date +%H:%M:%S) ==="
timeout 3600 python tools/probe_mbconv_fused.py > /tmp/r5_runs/mbconv.log 2>&1
echo "exit=$?"; cat /tmp/r5_runs/mbconv.log | tail -12

echo "=== probe_r50_conv_gemm: $(date +%H:%M:%S) ==="
timeout 3600 python tools/probe_r50_conv_gemm.py > /tmp/r5_runs/convgemm.log 2>&1
echo "exit=$?"; cat /tmp/r5_runs/convgemm.log | tail -16

echo "=== detr short gate re-record (100 ep): $(date +%H:%M:%S) ==="
timeout 4800 python tools/check_north_stars.py --budget short --only detr \
  --record > /tmp/r5_runs/detr_short_gate.log 2>&1
echo "exit=$?"; tail -6 /tmp/r5_runs/detr_short_gate.log

echo "=== bench: $(date +%H:%M:%S) ==="
timeout 2400 python bench.py > /tmp/r5_runs/bench.log 2>&1
echo "exit=$?"; tail -3 /tmp/r5_runs/bench.log

echo "=== r5 queue done: $(date +%H:%M:%S) ==="
