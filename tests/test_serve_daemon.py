"""Online serving daemon: dynamic batching, wire protocol, error paths,
checkpoint loading (h36x/serve_daemon.py; the reference has no serving
entry point — src/results.py:175-187 reloads checkpoints into the training
code instead)."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from h36x.models.phd import PHDFor3DJoints
from h36x.serve_daemon import (
    BatchingServer,
    build_predict_fn,
    request_async,
)
from h36x.train.step import make_forward

T, F, J = 6, 32, 17


@pytest.fixture(scope="module")
def model_and_params():
    model = PHDFor3DJoints(latent_dim=64, feature_dim=F, number_blocks=1)
    params = model.init(jax.random.key(0), jnp.zeros((1, T, F)))["params"]
    return model, params


@pytest.fixture(scope="module")
def predict_fn(model_and_params):
    model, params = model_and_params
    forward = make_forward(model)
    return lambda feats: forward(params, feats)


def _serve(server, coro):
    """Run `coro(port)` against a started server on an ephemeral port."""

    async def run():
        srv = await server.start(host="127.0.0.1", port=0)
        port = srv.sockets[0].getsockname()[1]
        try:
            return await coro(port)
        finally:
            server.stop()
            srv.close()
            await srv.wait_closed()

    return asyncio.run(run())


def test_concurrent_requests_batched_and_correct(predict_fn):
    server = BatchingServer(predict_fn, seq_len=T, feature_dim=F,
                            max_batch=8, max_wait_ms=200.0, pad_to=8)
    rng = np.random.default_rng(0)
    feats = [rng.normal(size=(T, F)).astype(np.float32) for _ in range(4)]

    async def clients(port):
        return await asyncio.gather(*[
            request_async(f, host="127.0.0.1", port=port) for f in feats
        ])

    outs = _serve(server, clients)
    want = np.asarray(predict_fn(np.stack(feats)))
    for got, w, f in zip(outs, want, feats):
        assert got.shape == (T, J, 3)
        np.testing.assert_allclose(got, w, rtol=1e-5, atol=1e-6)
    # all four rode one coalesced device batch
    assert server.stats["requests"] == 4
    assert server.stats["batches"] == 1


def test_sequential_requests_and_padding(predict_fn):
    """pad_to keeps the compiled shape fixed; single requests still work."""
    server = BatchingServer(predict_fn, seq_len=T, feature_dim=F,
                            max_batch=8, max_wait_ms=1.0, pad_to=8)
    f = np.random.default_rng(1).normal(size=(T, F)).astype(np.float32)

    async def client(port):
        a = await request_async(f, host="127.0.0.1", port=port)
        b = await request_async(f, host="127.0.0.1", port=port)
        return a, b

    a, b = _serve(server, client)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(
        a, np.asarray(predict_fn(f[None]))[0], rtol=1e-5, atol=1e-6)
    assert server.stats["batches"] == 2


def test_bucket_padding(predict_fn):
    """Artifact mode (pad_to=0, bucket_pad=True) pads each coalesced batch
    to the next power of two, bounding the set of compiled shapes."""
    from h36x.serve_daemon import bucket_size

    assert [bucket_size(n) for n in (1, 2, 3, 4, 5, 8, 9)] == \
        [1, 2, 4, 4, 8, 8, 16]

    seen = []

    def spy(feats):
        seen.append(feats.shape[0])
        return predict_fn(feats)

    server = BatchingServer(spy, seq_len=T, feature_dim=F, max_batch=8,
                            max_wait_ms=200.0, pad_to=0, bucket_pad=True)
    rng = np.random.default_rng(3)
    feats = [rng.normal(size=(T, F)).astype(np.float32) for _ in range(3)]

    async def clients(port):
        return await asyncio.gather(*[
            request_async(f, host="127.0.0.1", port=port) for f in feats
        ])

    outs = _serve(server, clients)
    want = np.asarray(predict_fn(np.stack(feats)))
    for got, w in zip(outs, want):
        np.testing.assert_allclose(got, w, rtol=1e-5, atol=1e-6)
    assert seen == [4]  # 3 requests coalesced, padded to the 4-bucket

    # non-power-of-two max_batch: the bucket clamps at the cap instead of
    # rounding past it into an unwarmed oversized shape
    seen.clear()
    server6 = BatchingServer(spy, seq_len=T, feature_dim=F, max_batch=6,
                             max_wait_ms=200.0, pad_to=0, bucket_pad=True)
    feats5 = [rng.normal(size=(T, F)).astype(np.float32) for _ in range(5)]

    async def clients5(port):
        return await asyncio.gather(*[
            request_async(f, host="127.0.0.1", port=port) for f in feats5
        ])

    outs = _serve(server6, clients5)
    want = np.asarray(predict_fn(np.stack(feats5)))
    for got, w in zip(outs, want):
        np.testing.assert_allclose(got, w, rtol=1e-5, atol=1e-6)
    assert seen == [6]  # bucket_size(5)=8 clamped to max_batch=6


def test_bad_requests_get_errors_and_connection_survives(predict_fn):
    server = BatchingServer(predict_fn, seq_len=T, feature_dim=F,
                            max_batch=4, max_wait_ms=1.0, pad_to=4)
    rng = np.random.default_rng(2)

    async def client(port):
        with pytest.raises(RuntimeError, match="expected shape"):
            await request_async(
                rng.normal(size=(T + 1, F)).astype(np.float32),
                host="127.0.0.1", port=port)
        # same server still serves a good request afterwards
        return await request_async(
            rng.normal(size=(T, F)).astype(np.float32),
            host="127.0.0.1", port=port)

    out = _serve(server, client)
    assert out.shape == (T, J, 3)


def test_unix_socket_stale_file_and_restart(predict_fn, tmp_path):
    """A stale socket from an unclean shutdown must not block rebinding."""
    sock = tmp_path / "h36x.sock"
    sock.touch()  # simulate leftover socket file

    async def run():
        server = BatchingServer(predict_fn, seq_len=T, feature_dim=F,
                                max_batch=2, max_wait_ms=1.0, pad_to=2)
        srv = await server.start(unix_path=str(sock))
        try:
            f = np.random.default_rng(4).normal(size=(T, F)).astype(np.float32)
            return await request_async(f, unix_path=str(sock))
        finally:
            server.stop()
            srv.close()
            await srv.wait_closed()

    out = asyncio.run(run())
    assert out.shape == (T, J, 3)


def test_stop_fails_queued_requests(predict_fn):
    """stop() must resolve queued futures so clients do not hang."""

    async def run():
        server = BatchingServer(predict_fn, seq_len=T, feature_dim=F)
        fut = asyncio.get_running_loop().create_future()
        await server._queue.put(
            (np.zeros((T, F), np.float32), fut,
             asyncio.get_running_loop().time()))
        server.stop()
        with pytest.raises(RuntimeError, match="server stopped"):
            await fut

    asyncio.run(run())


def test_build_predict_fn_from_checkpoint(model_and_params, tmp_path,
                                          predict_fn):
    from h36x.train import checkpoint as ckpt
    from h36x.train.state import TrainState, create_train_state, make_optimizer

    model, params = model_and_params
    optimizer, _ = make_optimizer(lr=1e-3)
    state = create_train_state(model, optimizer, jax.random.key(0),
                               jnp.zeros((1, T, F)))
    state = TrainState(params, state.opt_state, state.step)
    ckpt.save_checkpoint(tmp_path, "best", state, 0, 0.0, {})

    fn, pad_to = build_predict_fn(
        model_path=str(tmp_path / "best.msgpack"), seq_len=T, feature_dim=F,
        latent_dim=64, num_blocks=1, max_batch=4,
    )
    assert pad_to == 4
    f = np.random.default_rng(3).normal(size=(2, T, F)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(f)), np.asarray(predict_fn(f)),
                               rtol=1e-5, atol=1e-6)


def test_rollout_artifact_served(model_and_params):
    """A forecast artifact (h36x-export --forecast) is servable: the daemon
    concatenates (ctx, future) along time with a 'split' header and the
    client gets the pair back, matching the artifact called directly."""
    from h36x.export import export_rollout, load_artifact

    _, params = model_and_params
    steps = 3
    blob = export_rollout(params, steps=steps, seq_len=T, feature_dim=F,
                          platforms=("cpu",))
    fn = load_artifact(blob)
    server = BatchingServer(lambda feats: fn(feats), seq_len=T,
                            feature_dim=F, max_batch=4, max_wait_ms=50.0,
                            bucket_pad=True)
    rng = np.random.default_rng(5)
    feats = [rng.normal(size=(T, F)).astype(np.float32) for _ in range(2)]

    async def clients(port):
        return await asyncio.gather(*[
            request_async(f, host="127.0.0.1", port=port) for f in feats
        ])

    results = _serve(server, clients)
    want_ctx, want_fut = fn(np.stack(feats))
    for i, (ctx, fut) in enumerate(results):
        assert ctx.shape == (T, J, 3) and fut.shape == (steps, J, 3)
        np.testing.assert_allclose(ctx, np.asarray(want_ctx)[i],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(fut, np.asarray(want_fut)[i],
                                   rtol=1e-5, atol=1e-5)


def test_stop_fails_inflight_requests():
    """stop() during a device call must fail the futures of the batch
    already dequeued (stop()'s queue drain cannot reach them)."""
    import threading

    release = threading.Event()

    def slow_predict(feats):
        release.wait(10.0)
        return np.zeros((feats.shape[0], T, J, 3), np.float32)

    async def run():
        server = BatchingServer(slow_predict, seq_len=T, feature_dim=F,
                                max_batch=1, max_wait_ms=1.0)
        server._batcher = asyncio.ensure_future(server._batch_loop())
        fut = asyncio.get_running_loop().create_future()
        await server._queue.put(
            (np.zeros((T, F), np.float32), fut,
             asyncio.get_running_loop().time()))
        while not server._queue.empty():  # batcher took the item
            await asyncio.sleep(0.01)
        await asyncio.sleep(0.05)  # and is now inside run_in_executor
        server.stop()
        with pytest.raises(RuntimeError, match="server stopped"):
            await asyncio.wait_for(fut, timeout=5.0)
        release.set()

    asyncio.run(run())


def test_serve_cli_artifact_mode_rejects_model_flags():
    """Artifact mode bakes the architecture in; an explicit model flag
    cannot take effect and must error loudly (checkpoint mode errors on
    conflicts — artifact mode must not be the quiet exception). The check
    runs before the artifact file is touched."""
    import pytest

    from h36x.cli.serve import main as serve_main

    with pytest.raises(SystemExit, match="artifact mode"):
        serve_main(["--artifact", "nonexistent.hlo", "--groups", "64"])
    with pytest.raises(SystemExit, match="artifact mode"):
        serve_main(["--artifact", "nonexistent.hlo",
                    "--regressor-iters", "5"])


def test_stats_op_counts_and_latency(predict_fn):
    """{"op": "stats"} returns counts + latency percentiles; an unknown op
    gets the error envelope and the connection keeps serving."""
    from h36x.serve_daemon import _read_msg, _write_msg, stats_async

    server = BatchingServer(predict_fn, seq_len=T, feature_dim=F,
                            max_batch=8, max_wait_ms=200.0, pad_to=8)
    rng = np.random.default_rng(7)
    feats = [rng.normal(size=(T, F)).astype(np.float32) for _ in range(3)]

    async def clients(port):
        outs = await asyncio.gather(*[
            request_async(f, host="127.0.0.1", port=port) for f in feats
        ])
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        try:
            _write_msg(writer, {"op": "bogus"})
            await writer.drain()
            bad, _ = await _read_msg(reader)
            # same connection must survive the unknown op
            _write_msg(writer, {"op": "stats"})
            await writer.drain()
            good, _ = await _read_msg(reader)
        finally:
            writer.close()
        stats = await stats_async(host="127.0.0.1", port=port)
        return outs, bad, good, stats

    outs, bad, good, stats = _serve(server, clients)
    assert all(o.shape == (T, J, 3) for o in outs)
    assert "unknown op" in bad["error"]
    assert good["stats"]["requests"] == 3
    assert stats == good["stats"] or stats["requests"] == 3
    assert stats["batches"] == 1 and stats["rows"] == 3
    assert stats["mean_batch_rows"] == 3.0
    assert stats["uptime_s"] > 0 and stats["queue_depth"] == 0
    assert stats["batch_device_ms"]["n"] == 1
    assert stats["batch_device_ms"]["p50"] > 0
    assert stats["request_ms"]["n"] == 3
    assert stats["request_ms"]["p99"] >= stats["request_ms"]["p50"] > 0
    # ops never count as inference requests
    assert stats["requests"] == 3


def test_serve_cli_stats_flag_validation():
    """--stats is a client mode: it must reject a model source, and a bare
    invocation (no source, no --stats) must error instead of binding."""
    import pytest

    from h36x.cli.serve import main as serve_main

    with pytest.raises(SystemExit, match="running daemon"):
        serve_main(["--stats", "--artifact", "nonexistent.hlo"])
    with pytest.raises(SystemExit, match="required"):
        serve_main([])


def test_wire_protocol_fuzz_survival(predict_fn):
    """Adversarial garbage on the wire must never kill the daemon: random
    bytes, hostile header lengths, bad JSON, wrong payload sizes — every
    connection gets an error (or a close), and a well-formed request
    afterwards still succeeds."""
    from h36x.serve_daemon import _LEN, _read_msg

    server = BatchingServer(predict_fn, seq_len=T, feature_dim=F,
                            max_batch=4, max_wait_ms=1.0, pad_to=4)
    rng = np.random.default_rng(11)

    payloads = [
        b"",                                    # immediate close
        b"\x00",                                # truncated length prefix
        _LEN.pack(0),                           # zero-length header
        _LEN.pack(1 << 20),                     # header over the cap
        _LEN.pack(0xFFFFFFFFFFFFFFFF),          # absurd header length
        _LEN.pack(4) + b"nope",                 # not JSON
        _LEN.pack(2) + b"[]",                   # JSON but not an object
        _LEN.pack(17) + b'{"nbytes": -12345}',  # negative payload size
        # valid header, payload shorter than declared (then close)
        _LEN.pack(46)
        + b'{"shape": [6, 32], "dtype": "float32", "nbytes": 768}'[:46],
        bytes(rng.integers(0, 256, size=64, dtype=np.uint8)),  # noise
    ]

    async def clients(port):
        for p in payloads:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(p)
            try:
                await writer.drain()
                # server replies with the error envelope or closes; either
                # way this must not hang (bounded by wait_for)
                await asyncio.wait_for(_read_msg(reader), timeout=5.0)
            except (asyncio.IncompleteReadError, ConnectionError,
                    asyncio.TimeoutError):
                pass
            finally:
                writer.close()
        # the daemon must still serve a good request after all of that
        f = rng.normal(size=(T, F)).astype(np.float32)
        return await request_async(f, host="127.0.0.1", port=port)

    out = _serve(server, clients)
    assert out.shape == (T, J, 3)


def test_backpressure_rejects_past_max_queue():
    """Past max_queue queued requests, new ones get an explicit overload
    error instead of growing host memory without bound; accepted ones
    still complete once the device frees up."""
    import threading

    release = threading.Event()

    def slow_predict(feats):
        release.wait(10.0)
        return np.zeros((feats.shape[0], T, J, 3), np.float32)

    server = BatchingServer(slow_predict, seq_len=T, feature_dim=F,
                            max_batch=1, max_wait_ms=1.0, max_queue=2)
    rng = np.random.default_rng(5)
    feats = [rng.normal(size=(T, F)).astype(np.float32) for _ in range(6)]

    async def clients(port):
        async def one(f):
            try:
                return await request_async(f, host="127.0.0.1", port=port)
            except RuntimeError as e:
                return e

        # sequential sends make the accept/reject split deterministic:
        # 1 in flight (slow device) + 2 queued, the other 3 rejected
        results = []
        tasks = []
        for f in feats:
            tasks.append(asyncio.ensure_future(one(f)))
            await asyncio.sleep(0.05)
        release.set()
        for t in tasks:
            results.append(await t)
        return results

    results = _serve(server, clients)
    rejected = [r for r in results if isinstance(r, RuntimeError)]
    ok = [r for r in results if not isinstance(r, RuntimeError)]
    assert len(rejected) == 3 and len(ok) == 3
    assert all("overloaded" in str(e) for e in rejected)
    assert all(o.shape == (T, J, 3) for o in ok)
    assert server.stats["rejected"] == 3
    assert server.stats["requests"] == 3  # rejected ones never count


def test_drain_waits_for_inflight_and_queued():
    """drain() returns only after the queue and the in-flight batch empty
    (the graceful-shutdown half serve_forever wires to SIGTERM), and
    respects its deadline when the device never frees up."""
    import threading

    release = threading.Event()

    def slow_predict(feats):
        release.wait(10.0)
        return np.zeros((feats.shape[0], T, J, 3), np.float32)

    async def run():
        server = BatchingServer(slow_predict, seq_len=T, feature_dim=F,
                                max_batch=1, max_wait_ms=1.0)
        server._batcher = asyncio.ensure_future(server._batch_loop())
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        await server._queue.put(
            (np.zeros((T, F), np.float32), fut, loop.time()))
        while not server._inflight:  # batcher picked it up
            await asyncio.sleep(0.01)
        assert await server.drain(timeout_s=0.3) is False  # deadline honored
        release.set()
        assert await server.drain(timeout_s=5.0) is True
        await asyncio.wait_for(fut, timeout=5.0)  # request still completed
        server.stop()

    asyncio.run(run())


def test_request_timeout(predict_fn):
    """timeout_s bounds the whole round trip; a hung device raises
    TimeoutError in the client instead of hanging it forever, and a
    healthy daemon answers well inside a generous bound."""
    import threading

    release = threading.Event()

    def stuck_predict(feats):
        release.wait(10.0)
        return np.zeros((feats.shape[0], T, J, 3), np.float32)

    server = BatchingServer(stuck_predict, seq_len=T, feature_dim=F,
                            max_batch=1, max_wait_ms=1.0)
    f = np.random.default_rng(9).normal(size=(T, F)).astype(np.float32)

    async def client(port):
        with pytest.raises(asyncio.TimeoutError):
            await request_async(f, host="127.0.0.1", port=port,
                                timeout_s=0.5)
        release.set()
        return await request_async(f, host="127.0.0.1", port=port,
                                   timeout_s=30.0)

    out = _serve(server, client)
    assert out.shape == (T, J, 3)


def test_serve_cli_stats_over_unix_socket(predict_fn, tmp_path, capsys):
    """`h36x-serve --stats --unix <sock>` (the operator's query path) works
    against a live daemon end-to-end: server in a background event loop,
    one real request, then the CLI prints the stats JSON."""
    import json
    import threading

    from h36x.cli.serve import main as serve_main

    sock = str(tmp_path / "daemon.sock")
    server = BatchingServer(predict_fn, seq_len=T, feature_dim=F,
                            max_batch=4, max_wait_ms=1.0, pad_to=4)
    loop = asyncio.new_event_loop()
    ready = threading.Event()
    stop_box = {}

    async def run_server():
        stop_box["ev"] = asyncio.Event()
        srv = await server.start(unix_path=sock)
        ready.set()
        async with srv:
            await stop_box["ev"].wait()
        server.stop()

    t = threading.Thread(target=lambda: loop.run_until_complete(run_server()),
                         daemon=True)
    t.start()
    assert ready.wait(10.0)
    try:
        f = np.random.default_rng(3).normal(size=(T, F)).astype(np.float32)
        from h36x.serve_daemon import request

        out = request(f, unix_path=sock)
        assert out.shape == (T, J, 3)

        serve_main(["--stats", "--unix", sock])
        stats = json.loads(capsys.readouterr().out)
        assert stats["requests"] == 1 and stats["batches"] == 1
        assert stats["request_ms"]["n"] == 1
    finally:
        loop.call_soon_threadsafe(stop_box["ev"].set)
        t.join(10.0)
        loop.close()


def test_sigterm_shutdown_not_wedged_by_idle_client(predict_fn, tmp_path):
    """Review finding (round 4): on Python >= 3.12.1 `async with srv` exit
    waits for every connection handler, and handle() loops in _read_msg
    until the CLIENT closes — one idle keep-alive connection used to wedge
    the graceful SIGTERM shutdown until SIGKILL. serve_forever now closes
    surviving client transports after the drain, so shutdown completes
    with an idle client attached."""
    import os
    import signal

    from h36x.serve_daemon import serve_forever

    server = BatchingServer(predict_fn, seq_len=T, feature_dim=F,
                            max_batch=4, max_wait_ms=1.0, pad_to=4)
    sock = str(tmp_path / "daemon.sock")

    async def run():
        task = asyncio.ensure_future(
            serve_forever(server, drain_s=2.0, unix_path=sock))
        for _ in range(500):  # wait for the listener to bind
            if os.path.exists(sock):
                break
            await asyncio.sleep(0.01)
        # the idle client: connects, never sends, never closes
        _idle_reader, idle_writer = await asyncio.open_unix_connection(sock)
        # a real request proves the daemon is live alongside the idler
        f = np.random.default_rng(7).normal(size=(T, F)).astype(np.float32)
        out = await request_async(f, unix_path=sock)
        assert out.shape == (T, J, 3)

        os.kill(os.getpid(), signal.SIGTERM)  # the rolling-restart signal
        # pre-fix this hangs forever (handler parked in _read_msg keeps
        # Server.wait_closed from returning); the bound is the regression
        await asyncio.wait_for(task, timeout=15.0)
        idle_writer.close()

    asyncio.run(run())
    assert server.stats["requests"] == 1


def test_stats_client_timeout_against_unresponsive_endpoint(tmp_path):
    """`h36x-serve --stats` must not hang on a wedged daemon: stats_async
    with timeout_s raises instead of blocking forever in _read_msg (review
    finding, round 4 — the diagnostic tool hanging exactly when needed)."""
    sock = str(tmp_path / "wedged.sock")

    async def run():
        async def black_hole(reader, writer):
            await asyncio.sleep(30.0)  # accepts, never replies

        srv = await asyncio.start_unix_server(black_hole, path=sock)
        from h36x.serve_daemon import stats_async

        try:
            with pytest.raises(asyncio.TimeoutError):
                await stats_async(unix_path=sock, timeout_s=0.3)
        finally:
            # close WITHOUT `async with srv` / wait_closed(): on this
            # 3.12 stdlib a client cancelled inside wait_for leaves the
            # black-hole handler's connection in a state where
            # Server.wait_closed() never resolves even after the handler
            # returns (reproduced stdlib-only, no h36x code involved).
            # asyncio.run's shutdown cancels the sleeping handler task.
            srv.close()

    asyncio.run(run())
