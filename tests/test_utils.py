"""Small utilities: timers, config JSON, feed transform."""

import json
import time

import numpy as np

from h36x.config import TrainConfig, to_json
from h36x.parallel.feed import prefetch_to_device
from h36x.utils.timers import PhaseTimers


class TestPhaseTimers:
    def test_accumulates(self):
        t = PhaseTimers()
        t.start("a")
        time.sleep(0.01)
        dt = t.stop("a")
        assert dt >= 0.01
        t.add("a", 1.0)
        assert t.totals["a"] >= 1.01
        summary = t.summary(n_iters=2)
        assert "a" in summary and "s/iter" in summary

    def test_independent_phases(self):
        t = PhaseTimers()
        t.start("x")
        t.start("y")
        t.stop("y")
        t.stop("x")
        assert set(t.totals) == {"x", "y"}


class TestConfigJson:
    def test_roundtrip(self):
        cfg = TrainConfig()
        cfg.optim.lr = 0.123
        data = json.loads(to_json(cfg))
        assert data["optim"]["lr"] == 0.123
        assert data["model"]["latent_dim"] == 1024
        assert data["mesh"]["data"] == -1


class TestFeedTransform:
    def test_transform_applied_before_transfer(self):
        batches = [(np.ones((2, 2), np.float32) * i,) for i in range(3)]
        out = list(
            prefetch_to_device(iter(batches), transform=lambda b: (b[0] * 10,))
        )
        for i, (x,) in enumerate(out):
            np.testing.assert_allclose(np.asarray(x), np.ones((2, 2)) * i * 10)
