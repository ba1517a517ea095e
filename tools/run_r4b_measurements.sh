#!/bin/bash
# Round-4b serial TPU measurement queue: the two steps round-4a left broken
# (hrnet bench row errored on the missing classification neck; the DETR toy
# run found no dataset — the cache had been wiped). Self-sufficient now.
set -u
cd /root/repo
mkdir -p /tmp/r4_runs

# 0. regenerate the toy detection dataset if the cache was cleared
if [ ! -f "$HOME/.cache/torchok_tpu/toydet/train/ann.csv" ]; then
  echo "=== gen_toy_detection: $(date +%H:%M:%S) ==="
  python tools/gen_toy_detection.py > /tmp/r4_runs/gen_toydet.log 2>&1
  echo "exit=$?"
fi

# 1. bench with the fixed hrnet row (HRNetClassificationNeck)
echo "=== bench(r4b): $(date +%H:%M:%S) ==="
timeout 9000 python bench.py > /tmp/r4_runs/bench_r4b.log 2>&1
echo "exit=$?"; tail -1 /tmp/r4_runs/bench_r4b.log

# 2. DETR toy north-star, 300-epoch schedule + grad clip (VERDICT #5)
echo "=== detr_toy_300ep: $(date +%H:%M:%S) ==="
timeout 10800 python -m torchok_tpu -cp configs -cn detection_toy_detr \
  > /tmp/r4_runs/detr_toy.log 2>&1
echo "exit=$?"
grep -E "mAP|map" /tmp/r4_runs/detr_toy.log | tail -5

echo "=== r4b all done: $(date +%H:%M:%S) ==="
