#!/bin/bash
# Poll the TPU tunnel; when it answers, run the round-4 measurement queue.
# Probe uses a hard timeout because a dead tunnel HANGS jax.devices().
set -u
cd /root/repo
mkdir -p /tmp/r4_runs
for i in $(seq 1 200); do
  if timeout 120 python - <<'EOF' > /tmp/r4_runs/probe.log 2>&1
import jax
d = jax.devices()
assert d and d[0].platform == "tpu", d
print("tpu alive:", d)
EOF
  then
    echo "TPU alive at $(date +%H:%M:%S) (attempt $i)" | tee /tmp/r4_runs/alive.flag
    bash tools/run_r4_measurements.sh > /tmp/r4_runs/queue.log 2>&1
    rc=$?
    echo "queue done at $(date +%H:%M:%S), exit=$rc" >> /tmp/r4_runs/alive.flag
    exit 0
  fi
  echo "probe $i failed at $(date +%H:%M:%S)" >> /tmp/r4_runs/watch.log
  sleep 540
done
echo "gave up" >> /tmp/r4_runs/watch.log
