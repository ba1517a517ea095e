"""bench.py must emit its one JSON line no matter how the driver cuts it
(round-4 regression: BENCH_r04.json was rc=124/parsed=null — SIGKILLed
before the single final print).

Three covered paths:
  * normal completion — headline + extras measured;
  * budget exhaustion mid-extras — remaining cases get {"skipped": "budget"}
    and the line still carries the headline number;
  * the total-runtime watchdog — emits partial results and exits 0 even
    while the main thread is wedged in a blocking call.
"""
import json
import os
import subprocess
import sys
import time


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench(monkeypatch):
    """Import a fresh bench module on the CPU backend."""
    monkeypatch.setenv("TORCHOK_BENCH_CPU", "1")
    sys.modules.pop("bench", None)
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    return bench


def _run_main(bench, monkeypatch, capsys, budget_s, case_s=0.0):
    """Run bench.main() with instant fake cases and a chosen soft budget."""
    calls = []

    def fake_case(*a, **k):
        calls.append(a)
        if case_s:
            time.sleep(case_s)
        return {"images_per_sec_per_chip": 123.4, "mfu": 0.5,
                "batch_size": a[2] if len(a) > 2 else 0}

    monkeypatch.setattr(bench, "bench_case", fake_case)
    monkeypatch.setattr(bench, "bench_infer_case", fake_case)
    monkeypatch.setattr(bench, "BENCH_BUDGET_S", budget_s)
    bench._emitted.clear()
    bench._T_START = time.monotonic()
    with bench._result_lock:
        bench._RESULT["extras"].clear()
        bench._RESULT.update(value=0, vs_baseline=0)
        bench._RESULT.pop("error", None)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(line), calls


def test_normal_completion_measures_all(monkeypatch, capsys):
    bench = _load_bench(monkeypatch)
    out, _ = _run_main(bench, monkeypatch, capsys, budget_s=3600)
    assert out["headline_status"] == "ok"
    assert out["value"] == 123.4
    assert out["extras"], "extras list must not be empty"
    assert all("images_per_sec_per_chip" in v for v in out["extras"].values())


def test_budget_exhaustion_skips_but_keeps_headline(monkeypatch, capsys):
    bench = _load_bench(monkeypatch)
    # headline (instant) runs; the 0.3 s/case extras overrun the 0.5 s budget
    out, _ = _run_main(bench, monkeypatch, capsys, budget_s=0.5, case_s=0.3)
    assert out["headline_status"] == "ok"
    assert out["value"] == 123.4  # never lost
    skipped = [k for k, v in out["extras"].items() if v.get("skipped") == "budget"]
    measured = [k for k, v in out["extras"].items()
                if "images_per_sec_per_chip" in v]
    assert skipped, "late extras must carry skip markers"
    assert measured, "early extras within budget must still be measured"
    # priority order: resnet50 + swinv2 train cases come before everything
    assert "resnet50_224_bs256" in measured[0]


def test_emit_is_idempotent(monkeypatch, capsys):
    bench = _load_bench(monkeypatch)
    out, _ = _run_main(bench, monkeypatch, capsys, budget_s=3600)
    bench._emit()  # watchdog firing after main finished must print nothing
    assert capsys.readouterr().out.strip() == ""
    assert out["value"] == 123.4


def test_watchdog_emits_and_exits_zero_when_wedged():
    """Subprocess: a 1 s budget + 5 s grace fires the watchdog while the
    main thread is still compiling the headline; the process must print a
    parseable JSON line and exit 0 (NOT be killed empty-handed)."""
    env = {**os.environ, "TORCHOK_BENCH_CPU": "1", "TORCHOK_BENCH_SMOKE": "1",
           "TORCHOK_BENCH_BUDGET_S": "1", "TORCHOK_BENCH_GRACE_S": "5"}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert "timeout_note" in out
    assert out["headline_status"] in ("in_flight", "ok")
