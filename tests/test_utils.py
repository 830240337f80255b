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


class TestJaxCacheScoping:
    """setup_jax_cache must not enable the persistent cache on a forced-CPU
    process: XLA:CPU AOT cache loads warn 'machine type doesn't match' even
    same-machine (LLVM tuning features the host probe never reports), and
    CPU compiles are cheap anyway."""

    def test_forced_cpu_detected(self, monkeypatch):
        import jax

        from h36x.utils import runtime

        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        assert runtime._forced_cpu_platform()
        monkeypatch.setenv("JAX_PLATFORMS", "")
        # conftest pins jax_platforms='cpu' for the whole suite, so the
        # config probe must also report forced-CPU here
        assert runtime._forced_cpu_platform()
        # XLA_FLAGS device-count alone must NOT count as a CPU pin: it only
        # sizes the CPU platform, a TPU plugin still wins backend selection
        monkeypatch.setenv(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        prev = jax.config.jax_platforms
        jax.config.update("jax_platforms", None)
        try:
            assert not runtime._forced_cpu_platform()
        finally:
            jax.config.update("jax_platforms", prev)

    def test_disable_after_enable(self, monkeypatch, tmp_path):
        """dryrun_multichip's pattern: cache enabled at import, platform
        switched to CPU later -> disable_jax_cache must turn it off and
        keep later setup_jax_cache calls no-ops."""
        import jax

        from h36x.utils import runtime

        before = jax.config.jax_compilation_cache_dir
        monkeypatch.setattr(runtime, "_done", False)
        runtime.setup_jax_cache(str(tmp_path / "warm"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "warm")
        runtime.disable_jax_cache()
        assert jax.config.jax_compilation_cache_dir is None
        runtime.setup_jax_cache(str(tmp_path / "again"))  # stays off
        assert jax.config.jax_compilation_cache_dir is None
        jax.config.update("jax_compilation_cache_dir", before)

    def test_noop_under_cpu(self, monkeypatch, tmp_path):
        import jax

        from h36x.utils import runtime

        monkeypatch.setattr(runtime, "_done", False)
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.delenv("H36X_JAX_CACHE_DIR", raising=False)
        before = jax.config.jax_compilation_cache_dir
        runtime.setup_jax_cache()
        assert jax.config.jax_compilation_cache_dir == before

        # an explicit cache_dir still wins (user opt-in)
        monkeypatch.setattr(runtime, "_done", False)
        runtime.setup_jax_cache(str(tmp_path / "cache"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
        jax.config.update("jax_compilation_cache_dir", before)

    def test_machine_key_is_stable_and_scoped(self):
        from h36x.utils.runtime import _machine_scoped_default

        a = _machine_scoped_default()
        assert a == _machine_scoped_default()
        assert "h36x_jax" in a
