"""REAL two-process jax.distributed training on localhost CPU.

Replaces monkeypatch simulation for the multi-host paths: coordinator
bring-up (parallel/mesh.py init_distributed), per-process loader sharding,
``jax.make_array_from_process_local_data`` global-batch assembly, and the
distributed train step. The reference's analog is its real 3-process CPU DDP
metric test (reference: tests/base_tests/metrics/metric_manager/
test_metric_manager_ddp.py:81-86).

Topology: 2 processes x 2 virtual CPU devices = 4 global devices, vs a
single-process 4-device baseline. Shuffle is off and the global batch size
matches, so each optimizer step consumes the same SET of rows in both
topologies and the loss trajectory must agree to f32 reduction-ordering
tolerance.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "multiproc_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    # the parent test process pins XLA flags/platforms for its own jax;
    # workers configure their own
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)
    env["PYTHONPATH"] = str(REPO)
    return env


def _run_baseline(tmp_path) -> dict:
    out = tmp_path / "single.json"
    env = _clean_env()
    env["WORKER_LOCAL_DEVICES"] = "4"
    subprocess.run([sys.executable, str(WORKER), str(out)], env=env,
                   check=True, timeout=900, cwd=REPO)
    return json.loads(out.read_text())


@pytest.mark.timeout(1800)
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    procs = []
    outs = [tmp_path / f"rank{r}.json" for r in range(2)]
    for rank in range(2):
        env = _clean_env()
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(rank),
            "WORKER_LOCAL_DEVICES": "2",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(outs[rank])], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for rank, p in enumerate(procs):
        assert p.returncode == 0, (
            f"rank {rank} failed:\n{logs[rank][-4000:]}")

    records = [json.loads(o.read_text()) for o in outs]
    # the distributed runtime really came up: global view spans both hosts
    for r, rec in enumerate(records):
        assert rec["process_count"] == 2
        assert rec["global_devices"] == 4
        assert rec["process_index"] == r
    # both ranks computed the identical global step/loss (GSPMD: the loss is
    # a global mean, every process holds the same replicated scalar)
    assert records[0]["global_step"] == records[1]["global_step"]
    np.testing.assert_allclose(records[0]["final_loss"],
                               records[1]["final_loss"], rtol=1e-5)

    single = _run_baseline(tmp_path)
    assert single["process_count"] == 1
    assert single["global_devices"] == 4
    assert single["global_step"] == records[0]["global_step"]

    # loss trajectory parity: same rows per optimizer step in both
    # topologies; f32 reduction ordering is the only difference
    traj_multi = records[0]["epoch_losses"] or records[1]["epoch_losses"]
    assert traj_multi, "no train/loss rows logged by either rank"
    assert len(single["epoch_losses"]) == len(traj_multi)
    np.testing.assert_allclose(traj_multi, single["epoch_losses"],
                               rtol=2e-3, atol=1e-4)
