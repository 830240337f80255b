"""Small-scale drive of the soak drill (benchmarks/soak_extract.py).

Runs the full harness — synthetic ingested tree, production run_extract in
a killable subprocess, SIGKILL mid-run, --resume completion, CRC read-back
and exact coverage check — at a size that still triggers the kill. The
run of record at tens-of-thousands-of-clips scale is committed as
benchmarks/results_soak_r5.json (DESIGN.md "Scale soak").
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest


def test_soak_kill_resume_small(tmp_path):
    pytest.importorskip("cv2")
    out = tmp_path / "soak.json"
    r = subprocess.run(
        [sys.executable, "-m", "benchmarks.soak_extract",
         "--videos", "6", "--frames", "600", "--size", "64",
         "--resize", "32", "--seq-len", "8", "--stride", "2",
         "--shard-size", "8", "--shuffle-pool", "16", "--batch-size", "8",
         "--num-workers", "1",
         "--kill-at-frac", "0.25", "--sample-s", "0.1",
         "--workdir", str(tmp_path / "work"), "--out", str(out)],
        capture_output=True, text=True, timeout=900,
        cwd=str(Path(__file__).resolve().parent.parent))
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(out.read_text())
    assert res["ok"], res
    assert res["final"]["coverage_ok"]
    assert res["final"]["verify_errors"] == []
    # the drill actually exercised the SIGKILL + resume path
    assert res["resume_exercised"], (
        "kill never fired — extraction finished before any progress "
        f"sample; legs: {res['legs']}")
    assert res["legs"][0]["returncode"] != 0
    assert res["legs"][1]["returncode"] == 0
    assert res["rss_peak_mb"] > 0
