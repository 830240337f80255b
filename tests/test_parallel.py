"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates: mesh construction, batch/param shardings, DP gradient equivalence
(sharded step == single-device step), tensor-parallel rules, and the
prefetching device feed.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from h36x.models.phd import PHDFor3DJoints
from h36x.parallel.feed import prefetch_to_device
from h36x.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    shard_params,
)
from h36x.train.state import create_train_state, make_optimizer
from h36x.train.step import make_eval_step, make_train_step


def _require_devices(n=8):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


@pytest.fixture(scope="module")
def model_state():
    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1, dropout=0.0)
    optimizer, _ = make_optimizer(lr=1e-3, freeze_ar=True)
    state = create_train_state(model, optimizer, jax.random.key(0), jnp.zeros((2, 6, 32)))
    return model, optimizer, state


def synth(b=8, t=6, f=32, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.normal(size=(b, t, f)).astype(np.float32),
        (rng.normal(size=(b, t, 17, 3)) * 0.1).astype(np.float32),
        rng.normal(size=(b, t, 17, 2)).astype(np.float32),
        np.tile(np.eye(3, dtype=np.float32), (b, 1, 1)),
    )


class TestMesh:
    def test_make_mesh_shapes(self):
        _require_devices(8)
        mesh = make_mesh(data=-1, model=1)
        assert mesh.shape == {"data": 8, "model": 1}
        mesh = make_mesh(data=4, model=2)
        assert mesh.shape == {"data": 4, "model": 2}

    def test_bad_mesh_raises(self):
        _require_devices(8)
        with pytest.raises(ValueError):
            make_mesh(data=3, model=2)

    def test_tp_rules(self):
        _require_devices(8)
        mesh = make_mesh(data=4, model=2)
        k = np.zeros((32, 64))
        s = param_sharding_rules("input_proj/kernel", k, mesh)
        assert s.spec == P(None, "model")
        s = param_sharding_rules("f_movie/block0/conv1/kernel", np.zeros((3, 64, 64)), mesh)
        assert s.spec == P(None, None, "model")
        s = param_sharding_rules("f_movie/block0/gn1/scale", np.zeros((64,)), mesh)
        assert s.spec == P()
        # indivisible dims stay replicated
        s = param_sharding_rules("input_proj/kernel", np.zeros((32, 63)), mesh)
        assert s.spec == P()


class TestDataParallelStep:
    def test_dp_matches_single_device(self, model_state):
        """One sharded train step over data=8 must equal the unsharded step."""
        _require_devices(8)
        model, optimizer, state = model_state
        step = make_train_step(model, optimizer, donate=False)
        batch_np = synth(b=8)
        rng = jax.random.key(3)

        # single-device result
        batch1 = tuple(jnp.asarray(x) for x in batch_np)
        s_single, m_single = step(state, batch1, rng)

        # sharded result
        mesh = make_mesh(data=8, model=1)
        sharded_params = shard_params(jax.device_get(state.params), mesh)
        state_sh = state._replace(params=sharded_params)
        bs = batch_sharding(mesh)
        batch_sh = tuple(jax.device_put(x, bs) for x in batch_np)
        s_sharded, m_sharded = step(state_sh, batch_sh, rng)

        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s_single.params)),
            jax.tree.leaves(jax.device_get(s_sharded.params)),
        ):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    def test_dp_tp_mesh_runs(self, model_state):
        """data=4 x model=2 with TP param shardings compiles and matches."""
        _require_devices(8)
        model, optimizer, state = model_state
        step = make_train_step(model, optimizer, donate=False)
        batch_np = synth(b=8)
        rng = jax.random.key(3)

        batch1 = tuple(jnp.asarray(x) for x in batch_np)
        _, m_single = step(state, batch1, rng)

        mesh = make_mesh(data=4, model=2)
        state_sh = state._replace(params=shard_params(jax.device_get(state.params), mesh))
        bs = batch_sharding(mesh)
        batch_sh = tuple(jax.device_put(x, bs) for x in batch_np)
        _, m_sh = step(state_sh, batch_sh, rng)
        np.testing.assert_allclose(float(m_single["loss"]), float(m_sh["loss"]), rtol=1e-5)

    def test_eval_sharded(self, model_state):
        _require_devices(8)
        model, _, state = model_state
        eval_step = make_eval_step(model)
        mesh = make_mesh()
        bs = batch_sharding(mesh)
        batch = tuple(jax.device_put(x, bs) for x in synth(b=16))
        params = shard_params(jax.device_get(state.params), mesh)
        m = jax.device_get(eval_step(params, batch))
        batch1 = tuple(jnp.asarray(x) for x in synth(b=16))
        m1 = jax.device_get(eval_step(state.params, batch1))
        np.testing.assert_allclose(m["loss"], m1["loss"], rtol=1e-5)


class TestPrefetch:
    def test_order_and_content(self):
        batches = [
            {"x": np.full((4, 2), i, dtype=np.float32)} for i in range(5)
        ]
        out = list(prefetch_to_device(iter(batches)))
        assert len(out) == 5
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])

    def test_sharded_transfer(self):
        _require_devices(8)
        mesh = make_mesh()
        bs = batch_sharding(mesh)
        batches = [(np.arange(16, dtype=np.float32).reshape(8, 2),)]
        (out,) = list(prefetch_to_device(iter(batches), sharding=bs))
        assert out[0].sharding == bs
        np.testing.assert_array_equal(np.asarray(out[0]), batches[0][0])

    def test_producer_error_propagates(self):
        def gen():
            yield (np.zeros(2),)
            raise RuntimeError("boom")

        it = prefetch_to_device(gen())
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            list(it)

    def test_abandoned_consumer_releases_producer(self):
        """Closing the generator mid-epoch (step raised) must let the
        producer thread exit instead of blocking on the full queue forever."""
        import threading
        import time

        drained = []

        def endless():
            for i in range(10_000):
                drained.append(i)
                yield {"x": np.full((2,), i, np.float32)}

        before = threading.active_count()
        it = prefetch_to_device(endless(), buffer_size=2)
        next(it)
        it.close()  # consumer abandons (e.g. exception in the train step)
        deadline = time.time() + 5.0
        while time.time() < deadline and threading.active_count() > before:
            time.sleep(0.05)
        assert threading.active_count() <= before  # producer exited
        assert len(drained) < 100  # and did NOT drain the whole iterator


class TestMultiHostHelpers:
    """Single-process contracts of h36x/parallel/distributed.py (a pod run
    only changes who owns which rows, not these shapes/shardings)."""

    def test_local_batch_slice_partitions(self):
        from h36x.parallel.distributed import local_batch_slice

        rows = list(range(32))
        seen = []
        for pid in range(4):
            s = local_batch_slice(32, process_id=pid, process_count=4)
            assert s.stop - s.start == 8
            seen.extend(rows[s])
        assert seen == rows  # disjoint, ordered, complete

    def test_local_batch_slice_indivisible_raises(self):
        from h36x.parallel.distributed import local_batch_slice

        with pytest.raises(ValueError, match="not divisible"):
            local_batch_slice(30, process_id=0, process_count=4)

    def test_make_global_batch_shapes_and_sharding(self):
        from h36x.parallel.distributed import local_batch_slice, make_global_batch

        _require_devices(8)
        mesh = make_mesh(data=8, model=1)
        rng = np.random.default_rng(0)
        full = {
            "feats": rng.normal(size=(16, 4, 8)).astype(np.float32),
            "k": rng.normal(size=(16, 3, 3)).astype(np.float32),
        }
        # single process owns every row; the call must still produce
        # global-shape arrays laid out over the data axis
        s = local_batch_slice(16, process_id=0, process_count=1)
        out = make_global_batch({k: v[s] for k, v in full.items()}, mesh, 16)
        assert out["feats"].shape == (16, 4, 8)
        assert out["k"].shape == (16, 3, 3)
        assert out["feats"].sharding.spec == P("data")
        np.testing.assert_array_equal(np.asarray(out["feats"]), full["feats"])

    def test_make_global_batch_stacked(self):
        """Stacked (scan-dispatch) groups keep the step axis unsharded and
        shard rows on axis 1."""
        from h36x.parallel.distributed import make_global_batch

        _require_devices(8)
        mesh = make_mesh(data=8, model=1)
        x = np.arange(3 * 16 * 4, dtype=np.float32).reshape(3, 16, 4)
        out = make_global_batch({"x": x}, mesh, 16, stacked=True)
        assert out["x"].shape == (3, 16, 4)
        assert out["x"].sharding.spec == P(None, "data")
        np.testing.assert_array_equal(np.asarray(out["x"]), x)

    def test_make_global_batch_multislice_spec(self):
        from h36x.parallel.distributed import (
            make_global_batch,
            make_multislice_mesh,
            multislice_batch_sharding,
        )

        _require_devices(8)
        mesh = make_multislice_mesh(slices=2, data=2, model=2)
        assert mesh.shape == {"slice": 2, "data": 2, "model": 2}
        x = np.arange(48, dtype=np.float32).reshape(12, 4)
        out = make_global_batch({"x": x}, mesh, 12)
        assert out["x"].sharding.spec == P(("slice", "data"))
        assert out["x"].sharding == multislice_batch_sharding(mesh)
        np.testing.assert_array_equal(np.asarray(out["x"]), x)

    def test_multislice_mesh_bad_factorization(self):
        from h36x.parallel.distributed import make_multislice_mesh

        _require_devices(8)
        with pytest.raises(ValueError):
            make_multislice_mesh(slices=3, data=2, model=2)


class TestMultiSliceTraining:
    def test_dp_over_slice_x_data_matches_single_device(self, model_state):
        """One train step on a (slice=2, data=2, model=2) mesh — batch rows
        sharded over the slice x data super-axis, params TP-sharded over
        model and replicated across slices — must match the unsharded step.
        This is the DCN-topology variant of test_dp_matches_single_device."""
        from h36x.parallel.distributed import (
            make_multislice_mesh,
            multislice_batch_sharding,
        )

        _require_devices(8)
        model, optimizer, state = model_state
        step = make_train_step(model, optimizer, donate=False)
        batch_np = synth(b=8)
        rng = jax.random.key(3)

        batch1 = tuple(jnp.asarray(x) for x in batch_np)
        s_single, m_single = step(state, batch1, rng)

        mesh = make_multislice_mesh(slices=2, data=2, model=2)
        state_sh = state._replace(
            params=shard_params(jax.device_get(state.params), mesh)
        )
        bs = multislice_batch_sharding(mesh)
        batch_sh = tuple(jax.device_put(x, bs) for x in batch_np)
        s_sharded, m_sharded = step(state_sh, batch_sh, rng)

        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s_single.params)),
            jax.tree.leaves(jax.device_get(s_sharded.params)),
        ):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
