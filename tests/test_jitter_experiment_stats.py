"""Unit tests for the jitter-key experiment's verdict gate.

`benchmarks.jitter_key_experiment.summarize` is the statistics of record
behind the >10k full-dedup mode's "no-quality-loss" claim (DESIGN.md
"Jitter re-keying"); these tests pin its gate semantics so a future edit
cannot silently weaken the criterion. Reference semantics being deviated
from by the mode this gate legitimizes:
/root/reference/src/preprocess_resnet_features.py:287-297 (per-clip
jitter factor draw).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from benchmarks.jitter_key_experiment import summarize

_RESULTS = Path(__file__).resolve().parent.parent / "benchmarks" / \
    "results_jitter_key_r4.json"


def _mk(clip, frame, control):
    return {"clip": list(clip), "frame": list(frame),
            "control_2x": list(control)}


CONFIG = {"seeds": 4}


class TestSummarize:
    def test_no_loss_passes_when_frame_matches_clip(self):
        rng = np.random.default_rng(0)
        clip = 0.5 + 0.02 * rng.standard_normal(4)
        frame = 0.5 + 0.02 * rng.standard_normal(4)
        control = clip + 0.5  # clearly detected
        out = summarize(_mk(clip, frame, control), CONFIG)
        assert out["control_detectable"]
        assert out["keying_no_quality_loss"]
        assert out["verdict"].startswith("no-quality-loss")

    def test_quality_loss_detected(self):
        # frame is worse than clip by far more than 2*SE -> loss verdict
        clip = [0.50, 0.51, 0.49, 0.50]
        frame = [0.60, 0.61, 0.59, 0.60]
        control = [1.0, 1.01, 0.99, 1.0]
        out = summarize(_mk(clip, frame, control), CONFIG)
        assert out["control_detectable"]
        assert not out["keying_no_quality_loss"]
        assert out["verdict"] == "QUALITY LOSS DETECTED"

    def test_inconclusive_when_control_not_detected(self):
        # huge seed noise swamps both effects: the null means nothing
        rng = np.random.default_rng(1)
        clip = 0.5 + 0.5 * rng.standard_normal(4)
        frame = clip + 0.01
        control = clip + 0.02
        out = summarize(_mk(clip, frame, control), CONFIG)
        assert not out["control_detectable"]
        assert out["verdict"].startswith("INCONCLUSIVE")

    def test_gate_tightens_with_more_seeds(self):
        # The review finding the SE gate fixed: a fixed-multiple-of-std
        # bound never sharpens with n. Same per-seed mean shift + spread
        # must FAIL at high n even though it passed at low n.
        pat = np.array([-0.02, 0.02, -0.01, 0.01])  # std 0.018, mean 0

        def scores(n, mu):
            return mu + np.tile(pat, n // 4)

        # shift 0.02: below 2*SE (~0.026) at n=4, far above it at n=64
        shift = 0.02
        small = summarize(
            _mk(scores(4, 0.5), scores(4, 0.5 + shift), scores(4, 1.0)),
            {"seeds": 4})
        big = summarize(
            _mk(scores(64, 0.5), scores(64, 0.5 + shift), scores(64, 1.0)),
            {"seeds": 64})
        assert small["keying_no_quality_loss"]
        assert not big["keying_no_quality_loss"]
        assert big["keying_se_diff"] < small["keying_se_diff"]

    def test_significant_improvement_is_called_out(self):
        clip = [0.60, 0.61, 0.59, 0.60]
        frame = [0.50, 0.51, 0.49, 0.50]  # much better, tiny spread
        control = [1.0, 1.01, 0.99, 1.0]
        out = summarize(_mk(clip, frame, control), CONFIG)
        assert out["keying_no_quality_loss"]
        assert out["keying_two_sided_significant"]
        assert "IMPROVEMENT" in out["verdict"]

    def test_significant_loss_never_labeled_improvement(self):
        """Review finding (round 4): at df >= ~61 the two-sided t_crit
        drops below 2.0, so a LOSS with t in (t_crit, 2.0] used to pass the
        2*SE gate AND trip the `two_sided_significant` branch — summarize
        reported 'significant IMPROVEMENT under re-keying' for a
        statistically significant quality loss. A significant loss must
        fail the gate and read as a loss."""
        n = 64
        pat = np.tile([-0.02, 0.02, -0.01, 0.01], n // 4)
        clip = 0.5 + pat
        s = float(np.std(clip, ddof=1))
        se = float(np.sqrt(2.0 * s * s / n))
        # loss sized to t = 1.99: above t_crit(126) ~ 1.979, below 2.0
        frame = clip + 1.99 * se
        control = clip + 0.5
        out = summarize(_mk(clip, frame, control), {"seeds": n})
        assert out["keying_effect_signed"] > 0  # it IS a loss
        assert out["keying_two_sided_significant"]
        assert out["t_crit_two_sided_0p05"] < out["keying_t"] < 2.0
        assert not out["keying_no_quality_loss"]
        assert out["verdict"] == "QUALITY LOSS DETECTED"
        assert "IMPROVEMENT" not in out["verdict"]

    def test_noninferiority_gate_blocks_wide_uncertain_loss(self):
        """Round-5 pre-registered margin: a loss estimate SMALLER than 2*SE
        (so the old gate passes) but whose confidence interval extends past
        the 10% margin must NOT be adopted — verdict must demand more
        seeds, not declare no-quality-loss."""
        rng = np.random.default_rng(7)
        clip = 0.5 + 0.14 * rng.standard_normal(4)   # wide per-seed spread
        frame = clip + 0.06                          # loss > ~10% margin
        control = clip + 0.9
        out = summarize(_mk(clip, frame, control), CONFIG)
        assert out["control_detectable"]
        assert out["keying_no_quality_loss"]          # old gate passes...
        assert not out["noninferior_at_margin"]       # ...margin gate holds
        assert out["verdict"].startswith("NOT NON-INFERIOR")

    def test_noninferior_and_equivalent_when_effect_tiny_and_tight(self):
        clip = [0.50, 0.51, 0.49, 0.50]
        frame = [0.501, 0.509, 0.492, 0.499]          # ~0 effect, tight
        control = [1.0, 1.01, 0.99, 1.0]
        out = summarize(_mk(clip, frame, control), CONFIG)
        assert out["noninferior_at_margin"]
        assert out["tost_equivalent"]
        assert out["verdict"].startswith("no-quality-loss")

    def test_large_improvement_noninferior_but_not_tost_equivalent(self):
        """TOST can fail on a big IMPROVEMENT; that must not block adoption
        (non-inferiority is the gate of record), only read honestly."""
        clip = [0.60, 0.61, 0.59, 0.60]
        frame = [0.40, 0.41, 0.39, 0.40]              # improvement >> margin
        control = [1.0, 1.01, 0.99, 1.0]
        out = summarize(_mk(clip, frame, control), CONFIG)
        assert out["noninferior_at_margin"]
        assert not out["tost_equivalent"]
        assert "IMPROVEMENT" in out["verdict"]

    def test_margin_rule_is_ten_percent_of_clip_mean(self):
        clip = [0.50, 0.51, 0.49, 0.50]
        out = summarize(_mk(clip, clip, [1.0, 1.01, 0.99, 1.0]), CONFIG)
        np.testing.assert_allclose(
            out["margin_abs"], 0.10 * np.mean(clip), rtol=1e-12)
        assert out["margin_rel_preregistered"] == 0.10

    def test_committed_results_reproduce(self):
        """The JSON of record re-summarizes to its own committed fields."""
        rec = json.loads(_RESULTS.read_text())
        out = summarize(rec["per_seed"], rec["config"])
        assert out["verdict"] == rec["verdict"]
        np.testing.assert_allclose(out["keying_t"], rec["keying_t"])
        np.testing.assert_allclose(out["control_t"], rec["control_t"])


def test_recompute_cli_roundtrip(tmp_path):
    src = str(_RESULTS)
    out = tmp_path / "re.json"
    r = subprocess.run(
        [sys.executable, "-m", "benchmarks.jitter_key_experiment",
         "--recompute", src, "--out", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    re_summary = json.loads(out.read_text())
    rec = json.loads(_RESULTS.read_text())
    assert re_summary["verdict"] == rec["verdict"]
    assert re_summary["per_seed"] == rec["per_seed"]
