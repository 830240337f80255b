"""examples/quickstart.py must keep working: it is the first thing a new
user runs, and nothing else executes it. Runs in-process so the conftest's
forced-CPU 8-device config applies."""

import runpy
from pathlib import Path


def test_quickstart_runs(capsys):
    path = Path(__file__).resolve().parents[1] / "examples" / "quickstart.py"
    runpy.run_path(str(path), run_name="__main__")
    out = capsys.readouterr().out
    assert "best val MPJPE" in out
    assert "AR 5-step forecast" in out
