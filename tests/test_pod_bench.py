"""bench_pod.py must stay runnable: CI smoke on the 8-device virtual mesh.

The script is the staged one-command pod protocol (VERDICT r4 #6) — this
test keeps it from rotting until a real pod slice exists. Runs in a
subprocess because provisioning virtual CPU devices must happen before the
backend initializes (conftest already initialized it in this process).
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(*extra):
    r = subprocess.run(
        [sys.executable, str(REPO / "bench_pod.py"), "--virtual", "8",
         "--seconds", "0.75", "--channels", "8", "--block-size", "512",
         "--smoke", *extra],
        capture_output=True, text=True, cwd=str(REPO), timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, r.stdout
    return [json.loads(ln) for ln in lines]


def test_pod_bench_smoke_virtual_mesh():
    (out,) = _run()
    assert out["mesh"] == {"channel": 4, "time": 2}
    assert out["platform"] == "cpu"
    assert out["smoke"].startswith("ok")
    # the modeled prediction table is present and sane (for THIS tiny
    # smoke workload fixed comm latency dominates, so only structure and
    # monotonicity are asserted here; the flagship-scale bar is below)
    pred = {p["n_devices"]: p for p in out["predicted"]}
    assert set(pred) == {1, 2, 4, 8}
    assert pred[1]["predicted_efficiency_vs_linear"] == 1.0
    for n in (2, 4, 8):
        assert 0.0 < pred[n]["predicted_efficiency_vs_linear"] <= 1.0
        assert (pred[n]["predicted_samples_per_s"]
                > pred[1]["predicted_samples_per_s"])


def test_predicted_efficiency_meets_north_star_at_flagship_scale():
    """BASELINE.md:35's >=85%-efficiency-at-N>=2 north star must be
    *predicted* achievable for the flagship workload (64 ch x 30 s,
    B=4096) — if the model ever says otherwise, either the model or the
    sharding layout needs attention before a pod run."""
    sys.path.insert(0, str(REPO))
    try:
        from bench_pod import _predict_scaling
    finally:
        sys.path.pop(0)
    for n, t in ((2, 2), (4, 2), (8, 2)):
        p = _predict_scaling(n, t, 64, 30.0, 4096, 3.59e9)
        assert p["predicted_efficiency_vs_linear"] >= 0.85, p


def test_pod_bench_dynspec_probe_branch():
    probe, out = _run("--compiled-dynspec-probe")
    assert probe["dynspec_probe"] == "ok"
    assert probe["compiled"] is False  # CPU: interpret-equivalent path
    assert out["smoke"].startswith("ok")
