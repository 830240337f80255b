"""Unit tests for the phase-2 value experiment's verdict gates.

`benchmarks.phase2_value_experiment.summarize` is the statistics of record
behind the claim that h36x's phase-2 (f_AR curriculum) training delivers
real future-prediction skill (DESIGN.md "Phase-2 value"). The reference
defines but never trains f_AR (/root/reference/src/model.py:133-137), so
phase-2 semantics are h36x-defined — these tests pin the gate so a future
edit cannot silently weaken the criterion.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from benchmarks.phase2_value_experiment import summarize

_RESULTS = Path(__file__).resolve().parent.parent / "benchmarks" / \
    "results_phase2_value_r4.json"

ARMS = ("phase2", "phase1_raw", "persist", "velocity_gt")


def _mk(phase2, phase1_raw, persist, velocity_gt=None, phi_ratio=None):
    """Per-seed motion scores; abs_* rows mirror motion (not gated)."""
    if velocity_gt is None:
        velocity_gt = [v / 2 for v in persist]
    if phi_ratio is None:  # clearly-learned dynamics unless the test says
        phi_ratio = [0.50 + 0.01 * i for i in range(len(phase2))]
    vals = dict(zip(ARMS, (phase2, phase1_raw, persist, velocity_gt)))
    out = {}
    for pre in ("motion", "abs"):
        for arm in ARMS:
            out[f"{pre}_{arm}"] = list(vals[arm])
    out["phi_ratio"] = list(phi_ratio)
    return out


def _cfg(n):
    return {"seeds": n}


class TestSummarize:
    def test_beats_persistence(self):
        # trained rollout clearly under both the untrained arm and the
        # zero-motion baseline, tiny seed spread -> the value verdict
        out = summarize(_mk(phase2=[0.010, 0.011, 0.009],
                            phase1_raw=[0.50, 0.51, 0.49],
                            persist=[0.020, 0.021, 0.019]), _cfg(3))
        assert out["sanity_training_matters"]
        assert out["beats_persistence"]
        assert out["verdict"] == "beats-persistence"

    def test_no_skill_when_training_does_not_beat_untrained(self):
        # phase2 indistinguishable from the random-init f_AR rollout:
        # nothing was learned, whatever the persist comparison says
        out = summarize(_mk(phase2=[0.50, 0.51, 0.49],
                            phase1_raw=[0.50, 0.49, 0.51],
                            persist=[0.60, 0.61, 0.59]), _cfg(3))
        assert not out["sanity_training_matters"]
        assert out["verdict"].startswith("no-skill")

    def test_learns_dynamics_without_beating_persistence(self):
        # beats the untrained arm decisively and predicts next-φ far
        # better than φ-copy, but joint-space motion sits above the
        # zero-motion baseline (pose-noise floor) -> the middle verdict
        out = summarize(_mk(phase2=[0.120, 0.122, 0.118],
                            phase1_raw=[1.60, 1.65, 1.58],
                            persist=[0.025, 0.0251, 0.0249],
                            phi_ratio=[0.55, 0.57, 0.53]), _cfg(3))
        assert out["sanity_training_matters"]
        assert out["learns_dynamics"]
        assert not out["beats_persistence"]
        assert out["verdict"] == \
            "learns-dynamics, not past joint-space persistence"

    def test_skill_without_dynamics(self):
        # beats the untrained arm but the φ-space ratio is ~1: f_AR
        # memorized nothing about motion -> the weakest passing verdict
        out = summarize(_mk(phase2=[0.040, 0.041, 0.039],
                            phase1_raw=[0.50, 0.51, 0.49],
                            persist=[0.020, 0.021, 0.019],
                            phi_ratio=[1.00, 1.02, 0.98]), _cfg(3))
        assert out["sanity_training_matters"]
        assert not out["learns_dynamics"]
        assert not out["beats_persistence"]
        assert out["verdict"] == "skill-above-random, no measured dynamics"

    def test_single_seed_cannot_pass_any_gate(self):
        out = summarize(_mk([0.01], [0.5], [0.02]), _cfg(1))
        assert out["t_phase2_vs_persist"] is None
        assert out["t_phi_ratio"] is None
        assert not out["sanity_training_matters"]
        assert not out["learns_dynamics"]
        assert not out["beats_persistence"]
        assert out["verdict"].startswith("no-skill")

    def test_gate_tightens_with_more_seeds(self):
        # SE-based gate: the same per-seed mean gap + spread that is not
        # significant at n=4 must become significant at n=64
        pat = np.array([-0.02, 0.02, -0.01, 0.01])

        def scores(n, mu):
            return list(mu + np.tile(pat, n // 4))

        gap = 0.02  # below 2*SE at n=4, far above at n=64
        small = summarize(_mk(scores(4, 0.10 - gap), scores(4, 0.5),
                              scores(4, 0.10)), _cfg(4))
        big = summarize(_mk(scores(64, 0.10 - gap), scores(64, 0.5),
                            scores(64, 0.10)), _cfg(64))
        assert not small["beats_persistence"]
        assert big["beats_persistence"]

    def test_committed_results_reproduce(self):
        """The JSON of record re-summarizes to its own committed fields."""
        rec = json.loads(_RESULTS.read_text())
        out = summarize(rec["per_seed"], rec["config"])
        assert out["verdict"] == rec["verdict"]
        np.testing.assert_allclose(out["t_phase2_vs_persist"],
                                   rec["t_phase2_vs_persist"])
        np.testing.assert_allclose(out["t_phase2_vs_phase1_raw"],
                                   rec["t_phase2_vs_phase1_raw"])
        np.testing.assert_allclose(out["t_phi_ratio"], rec["t_phi_ratio"])


def test_recompute_cli_roundtrip(tmp_path):
    out = tmp_path / "re.json"
    r = subprocess.run(
        [sys.executable, "-m", "benchmarks.phase2_value_experiment",
         "--recompute", str(_RESULTS), "--out", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    re_summary = json.loads(out.read_text())
    rec = json.loads(_RESULTS.read_text())
    assert re_summary["verdict"] == rec["verdict"]
    assert re_summary["per_seed"] == rec["per_seed"]
