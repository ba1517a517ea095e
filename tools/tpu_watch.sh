#!/bin/bash
# Poll the TPU tunnel; when it answers, run the round-3b measurement queue.
# Probe uses a hard timeout because a dead tunnel HANGS jax.devices().
set -u
cd /root/repo
mkdir -p /tmp/r3b_runs
for i in $(seq 1 200); do
  if timeout 90 python - <<'EOF' > /tmp/r3b_runs/probe.log 2>&1
import jax
d = jax.devices()
assert d and d[0].platform == "tpu", d
print("tpu alive:", d)
EOF
  then
    echo "TPU alive at $(date +%H:%M:%S) (attempt $i)" | tee /tmp/r3b_runs/alive.flag
    bash tools/run_r3b_measurements.sh > /tmp/r3b_runs/queue.log 2>&1
    rc=$?  # capture before $(date) resets $?
    echo "queue done at $(date +%H:%M:%S), exit=$rc" >> /tmp/r3b_runs/alive.flag
    exit 0
  fi
  echo "probe $i failed at $(date +%H:%M:%S)" >> /tmp/r3b_runs/watch.log
  sleep 540
done
echo "gave up" >> /tmp/r3b_runs/watch.log
