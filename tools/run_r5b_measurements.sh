#!/bin/bash
# Round-5b serial TPU queue (after run_r5_measurements.sh):
#  1. conv implicit-GEMM retry with G images per grid cell (M = G*HW)
#  2. fused-MBConv probe retry (2D per-channel operands, flushed prints,
#     per-case isolation — the first attempt wedged server-side in its
#     first compile with zero CPU; a per-case timeout bounds a repeat)
#  3. DETR 500-epoch schedule A/B (set-prediction schedule hunger test)
set -u
cd /root/repo
mkdir -p /tmp/r5_runs

echo "=== tpu probe: $(date +%H:%M:%S) ==="
timeout 120 python -c "import jax; print(jax.devices())" \
  > /tmp/r5_runs/probe_b.log 2>&1 || { echo "TPU unreachable"; exit 1; }

echo "=== probe_r50_conv_gemm (G-variant): $(date +%H:%M:%S) ==="
timeout 3600 python -u tools/probe_r50_conv_gemm.py \
  > /tmp/r5_runs/convgemm_g.log 2>&1
echo "exit=$?"; grep -v -i warning /tmp/r5_runs/convgemm_g.log | tail -16

echo "=== XLA conv flag A/B (scoped vmem): $(date +%H:%M:%S) ==="
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" TORCHOK_PROBE_XLA_ONLY=1 \
  timeout 1800 python -u tools/probe_r50_conv_gemm.py \
  > /tmp/r5_runs/conv_flags_vmem.log 2>&1
echo "exit=$?"; grep -v -i warning /tmp/r5_runs/conv_flags_vmem.log | tail -5

echo "=== probe_mbconv_fused stage5: $(date +%H:%M:%S) ==="
TORCHOK_PROBE_CASES=stage5_14x14_mid672_k5 timeout 1800 \
  python -u tools/probe_mbconv_fused.py > /tmp/r5_runs/mbconv_s5.log 2>&1
echo "exit=$?"; grep -v -i warning /tmp/r5_runs/mbconv_s5.log | tail -6

echo "=== probe_mbconv_fused stage3: $(date +%H:%M:%S) ==="
TORCHOK_PROBE_CASES=stage3_56x56_mid144_k3 timeout 1800 \
  python -u tools/probe_mbconv_fused.py > /tmp/r5_runs/mbconv_s3.log 2>&1
echo "exit=$?"; grep -v -i warning /tmp/r5_runs/mbconv_s3.log | tail -6

echo "=== DETR 500-epoch schedule A/B: $(date +%H:%M:%S) ==="
rm -rf ~/.cache/torchok_tpu/toydet/ckpt_500
timeout 14400 python -m torchok_tpu -cp configs -cn detection_toy_detr \
  trainer.max_epochs=500 optimization.0.scheduler.params.T_max=500 \
  callbacks.1.params.dirpath='${oc.env:HOME}/.cache/torchok_tpu/toydet/ckpt_500' \
  > /tmp/r5_runs/detr_500ep.log 2>&1
echo "exit=$?"

echo "=== r5b queue done: $(date +%H:%M:%S) ==="
