"""The benchmark harnesses are product surfaces (the driver runs bench.py
every round; bench_ops.py produces the committed roofline artifact), so CI
smoke-runs them on tiny CPU configs — a harness crash would otherwise only
surface during a chip session, where it costs a tunnel slot to debug."""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(args, timeout=240):
    r = subprocess.run(
        [sys.executable] + args, cwd=str(ROOT), capture_output=True,
        text=True, timeout=timeout,
        env={"PATH": "/usr/bin:/bin", "PADT_BENCH_PLATFORM": "cpu",
             "PYTHONPATH": ""},
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return r.stdout


def test_bench_ops_smoke_cpu():
    out = _run(["bench_ops.py", "--channels", "2", "--seconds", "1",
                "--block", "512", "--json", "--roofline"])
    payload = json.loads(out.strip().splitlines()[-1])
    assert "saturator" in payload["results"]
    assert "calibration" in payload
    for row in payload["results"].values():
        assert row["ms_per_block"] > 0
        assert "bound" in row


def test_gen_roofline_renders_committed_capture(tmp_path):
    r = subprocess.run(
        [sys.executable, str(ROOT / "docs" / "gen_roofline.py"),
         str(ROOT / "BENCH_OPS.json")],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    md = (ROOT / "docs" / "roofline.md").read_text()
    assert "Achieved-peak calibration" in md
    assert "chain8_total" in md
