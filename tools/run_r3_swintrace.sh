#!/bin/bash
# Chained after run_r3_followup.sh: xplane trace of the fused-kernel swin
# step to attribute the remaining (1 - 13.6%) of step time.
set -u
cd /root/repo
mkdir -p /tmp/r3_runs
while ! grep -q "followup done" /tmp/r3_followup.log 2>/dev/null; do sleep 60; done

echo "=== swin_trace(fused): $(date +%H:%M:%S) ==="
timeout 3600 python - > /tmp/r3_runs/swin_trace.log 2>&1 <<'EOF'
import sys, os, functools
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/torchok_tpu/jax")
import jax, numpy as np
from bench import build_trainer
trainer, task = build_trainer("swinv2_tiny_window8_256", 256, 128)
step = trainer._make_train_step(task, trainer.tx)
rng = np.random.default_rng(0)
host = {"image": rng.normal(size=(128,256,256,3)).astype(np.float32),
        "target": rng.integers(0, 1000, size=(128,)).astype(np.int64)}
batch = jax.device_put(host, trainer.data_sharding)
batch = {**batch, "image": batch["image"].astype(task.compute_dtype)}
@functools.partial(jax.jit, donate_argnums=(0,))
def multi(state, b):
    def body(s, _):
        s2, _o, l = step(s, b)
        return s2, l["loss"]
    return jax.lax.scan(body, state, None, length=10)
state = trainer.state
state, l = multi(state, batch); jax.block_until_ready(l)
with jax.profiler.trace("/tmp/swin_fused_trace"):
    state, l = multi(state, batch); jax.block_until_ready(l)
print("trace done")
EOF
echo "exit=$?"
timeout 900 python tools/analyze_xplane.py /tmp/swin_fused_trace > /tmp/r3_runs/swin_xplane.log 2>&1
echo "xplane exit=$?"
echo "=== swintrace done: $(date +%H:%M:%S) ==="
