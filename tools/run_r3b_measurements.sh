#!/bin/bash
# Round-3b serial TPU measurement queue (only ONE process may hold the chip):
# validates + A/Bs the new fused kernel modes on real hardware.
# Logs under /tmp/r3b_runs.
set -u
cd /root/repo
mkdir -p /tmp/r3b_runs

# 1. DaViT / GCViT train-step A/B: fused dot-product + global-q kernels
#    vs the XLA formulation (also the Mosaic compile check for the
#    windowed-layout and global-q modes)
echo "=== probe_davit_gcvit: $(date +%H:%M:%S) ==="
timeout 5400 python tools/probe_davit_gcvit.py davit_t gcvit_tiny \
  > /tmp/r3b_runs/davit_gcvit_ab.log 2>&1
echo "exit=$?"; grep -E "speedup|img" /tmp/r3b_runs/davit_gcvit_ab.log | tail -8

# 2. bench regression (swin fused default unchanged, resnet rows stable)
echo "=== bench: $(date +%H:%M:%S) ==="
timeout 3600 python bench.py > /tmp/r3b_runs/bench.log 2>&1
echo "exit=$?"; tail -1 /tmp/r3b_runs/bench.log

# 3. fresh swin fused-path xplane: attribute the ~20% of step span outside
#    matmul/Pallas/elementwise (round-4 lever hunting)
echo "=== swin xplane: $(date +%H:%M:%S) ==="
rm -rf /tmp/swin_trace
timeout 2700 python tools/swin_trace.py > /tmp/r3b_runs/swin_trace.log 2>&1
echo "exit=$?"
timeout 900 python tools/analyze_xplane.py /tmp/swin_trace \
  > /tmp/r3b_runs/swin_xplane.log 2>&1
echo "exit=$?"; tail -15 /tmp/r3b_runs/swin_xplane.log

echo "=== all done: $(date +%H:%M:%S) ==="
