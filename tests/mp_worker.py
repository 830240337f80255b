"""Worker process for the true multi-process integration test.

Launched by tests/test_multiprocess.py as N separate Python processes. Each
process owns 2 virtual CPU devices and only its rows of the global batch
(h36x.parallel.distributed.local_batch_slice); jax.distributed + gloo CPU
collectives make the mesh span all processes — the same code path a real
multi-host TPU pod takes, with gloo standing in for DCN.

Runs a few real PHD train steps on a (slice=nproc, data=2, model=1) mesh and
writes the per-step losses plus a param checksum to a JSON file (process 0).

Usage: python tests/mp_worker.py <port> <pid> <nproc> <out.json>
"""

import json
import sys


def main() -> None:
    port, pid, nproc, outpath = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    import jax

    # Same forcing order as tests/conftest.py: the axon TPU plugin registers
    # first, so the platform must be pinned before any backend init.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from h36x.parallel.distributed import initialize

    initialize(coordinator_address=f"localhost:{port}",
               num_processes=nproc, process_id=pid)
    assert jax.process_index() == pid
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    import numpy as np
    import jax.numpy as jnp

    from h36x.models.phd import PHDFor3DJoints
    from h36x.parallel.distributed import (
        local_batch_slice,
        make_global_batch,
        make_multislice_mesh,
    )
    from h36x.parallel.mesh import shard_params
    from h36x.train.state import create_train_state, make_optimizer
    from h36x.train.step import make_train_step

    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1,
                           dropout=0.0)
    optimizer, _ = make_optimizer(lr=1e-3, freeze_ar=True)
    state = create_train_state(model, optimizer, jax.random.key(0),
                               jnp.zeros((2, 6, 32)))
    step = make_train_step(model, optimizer, donate=False)

    # slice axis == process boundary (devices are process-major), so the
    # final gradient psum hop crosses gloo exactly like DCN on a pod.
    mesh = make_multislice_mesh(slices=nproc, data=2, model=1)
    state = state._replace(params=shard_params(jax.device_get(state.params),
                                               mesh))

    global_batch = 8
    rows = local_batch_slice(global_batch)
    assert rows.stop - rows.start == global_batch // nproc

    losses = []
    for i in range(3):
        rng = np.random.default_rng(i)
        full = (
            rng.normal(size=(global_batch, 6, 32)).astype(np.float32),
            (rng.normal(size=(global_batch, 6, 17, 3)) * 0.1).astype(np.float32),
            rng.normal(size=(global_batch, 6, 17, 2)).astype(np.float32),
            np.tile(np.eye(3, dtype=np.float32), (global_batch, 1, 1)),
        )
        # each process materializes ONLY its rows
        batch = make_global_batch(tuple(x[rows] for x in full), mesh,
                                  global_batch)
        assert batch[0].shape == (global_batch, 6, 32)
        state, metrics = step(state, batch, jax.random.key(3))
        losses.append(float(metrics["loss"]))

    # Grouped dispatch across the process boundary: one scan_steps=2
    # program over a STACKED global batch (step axis unsharded, rows over
    # slice x data) must continue the trajectory exactly like two more
    # single dispatches would.
    mstep = make_train_step(model, optimizer, donate=False, scan_steps=2)

    def synth(seed):
        r = np.random.default_rng(seed)
        return (
            r.normal(size=(global_batch, 6, 32)).astype(np.float32),
            (r.normal(size=(global_batch, 6, 17, 3)) * 0.1).astype(np.float32),
            r.normal(size=(global_batch, 6, 17, 2)).astype(np.float32),
            np.tile(np.eye(3, dtype=np.float32), (global_batch, 1, 1)),
        )

    full2 = tuple(np.stack([a, b]) for a, b in zip(synth(100), synth(101)))
    stacked = make_global_batch(tuple(x[:, rows] for x in full2), mesh,
                                global_batch, stacked=True)
    assert stacked[0].shape == (2, global_batch, 6, 32)
    state, mm, _ = mstep(state, stacked, jax.random.key(9))
    scan_losses = [float(v) for v in jax.device_get(mm["loss"])]

    # params end replicated (model axis unused) -> checksum is global
    checksum = float(
        sum(float(jnp.sum(jnp.abs(p))) for p in
            jax.tree.leaves(jax.device_get(state.params)))
    )
    if pid == 0:
        with open(outpath, "w") as f:
            json.dump({"losses": losses, "scan_losses": scan_losses,
                       "checksum": checksum,
                       "devices": jax.device_count()}, f)
    # all processes must survive to the end for the run to count
    print(f"mp_worker {pid}/{nproc} ok", flush=True)


if __name__ == "__main__":
    main()
