#!/usr/bin/env python
"""Multi-process mesh smoke: REAL ``jax.distributed`` run on CPU.

Exercises the actual multi-host code paths of ``parallel/host.py``
(``jax.make_array_from_process_local_data`` over a mesh whose devices
span processes, ``ShardedSampler``, and a psum-reduced step) — not the
fake-process-index unit tests.

Run with no args to launch the 2-process job (each process gets 4
virtual CPU devices -> an 8-device global mesh); the launcher checks
both workers print their OK line.
"""

from __future__ import annotations

import os
import subprocess
import sys

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 4
PORT = int(os.environ.get("SMOKE_PORT", "54321"))


def worker(process_id: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count="
          f"{DEVICES_PER_PROCESS}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NUM_PROCESSES, process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tao_amodal_tpu.parallel.host import (
        ShardedSampler,
        global_batch_from_local,
        host_shard_indices,
    )

    assert jax.process_count() == NUM_PROCESSES
    assert jax.device_count() == NUM_PROCESSES * DEVICES_PER_PROCESS
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1, 1),
                ("data", "model"))

    # Every process loads ITS shard of the global batch; the global
    # array spans processes.
    G = 16
    sl = host_shard_indices(G)
    full = np.arange(G * 8, dtype=np.float32).reshape(G, 8)
    local = full[sl]
    batch = global_batch_from_local(mesh, {"x": local}, G)
    assert batch["x"].shape == (G, 8)

    # A psum-style reduction over the cross-process mesh: global mean
    # must equal the numpy mean of the FULL batch on every process.
    @jax.jit
    def global_mean(x):
        return jnp.mean(x)

    got = float(global_mean(batch["x"]))
    want = float(full.mean())
    assert abs(got - want) < 1e-5, (got, want)

    # Round-trip: gather the global array back to every host.
    rep = jax.device_get(
        jax.jit(lambda x: x,
                out_shardings=NamedSharding(mesh, P()))(batch["x"]))
    np.testing.assert_allclose(rep, full)

    # DistributedSampler-equivalent: shards are disjoint + complete.
    s = ShardedSampler(10, seed=3)
    mine = set(s.epoch_indices(0).tolist())
    assert len(mine) == 10 // NUM_PROCESSES

    # REAL DP detector train step across processes: each host feeds
    # only its local shard; the loss must match the single-process
    # run bit-for-bit up to reduction order (compared by the
    # launcher against the "ref" mode run below).
    loss, gnorm = _train_step_loss(mesh, local_only=True)
    print(f"TRAINSTEP loss={loss:.8f} grad_norm={gnorm:.8f}")

    print(f"MULTIPROCESS OK process={process_id} "
          f"devices={jax.device_count()} mean={got}")


def _make_batch(B):
    """Deterministic global batch (same on every process)."""
    import numpy as np

    rng = np.random.RandomState(0)
    G = 4
    return {
        "images": rng.rand(B, 64, 64, 3).astype(np.float32),
        "gt_boxes": np.tile(
            np.array([[4, 4, 30, 30], [10, 10, 50, 40],
                      [2, 8, 20, 60], [30, 30, 60, 60]], np.float32),
            (B, 1, 1)),
        "gt_amodal": np.tile(
            np.array([[2, 2, 34, 34], [8, 8, 54, 44],
                      [0, 4, 24, 64], [26, 26, 64, 64]], np.float32),
            (B, 1, 1)),
        "gt_classes": np.ones((B, G), np.int32),
        "gt_valid": np.ones((B, G), bool),
    }


def _train_step_loss(mesh, local_only):
    """One full DP detector+expander train step on ``mesh``.

    ``local_only=True`` feeds each process its own shard through
    ``global_batch_from_local`` (the multi-host path,
    ``parallel/host.py:28-39``); ``False`` shards a host-resident
    global batch (single-process path).  Same math either way —
    that's the parity contract (reference semantics:
    ``pysot/pysot/utils/distributed.py:126-137`` reduce_gradients).
    """
    import jax
    import numpy as np

    from tao_amodal_tpu.parallel.dp import make_train_step
    from tao_amodal_tpu.parallel.host import (
        global_batch_from_local,
        host_shard_indices,
    )
    from tao_amodal_tpu.parallel.mesh import shard_batch
    from tao_amodal_tpu.pipeline import AmodalPipeline
    from tao_amodal_tpu.train.detector_loss import detector_train_loss
    from tao_amodal_tpu.train.optim import log_schedule, make_optimizer

    import jax.numpy as jnp

    pipeline = AmodalPipeline.create(
        num_classes=8, num_dets=8, num_proposals=16,
        backbone_stages=(1, 1, 1, 1))
    clip = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = pipeline.init(jax.random.PRNGKey(0), clip)
    optimizer = make_optimizer(log_schedule(1e-3, 1e-5, 100))
    opt_state = optimizer.init(variables)

    def loss_fn(params, batch, rng):
        return detector_train_loss(pipeline.detector, pipeline.expander,
                                   params, batch, rng)

    step = make_train_step(loss_fn, optimizer, mesh, donate=False)
    B = mesh.shape["data"]
    batch = _make_batch(B)
    if local_only:
        sl = host_shard_indices(B)
        batch = global_batch_from_local(
            mesh, {k: v[sl] for k, v in batch.items()}, B)
    else:
        batch = shard_batch(mesh, batch)
    state = (variables, opt_state)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    return float(metrics["loss"]), float(metrics["grad_norm"])


def reference(total_devices: int) -> None:
    """Single-process run of the same train step (parity oracle)."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count="
          f"{total_devices}").strip()
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1, 1),
                ("data", "model"))
    loss, gnorm = _train_step_loss(mesh, local_only=False)
    print(f"TRAINSTEP loss={loss:.8f} grad_norm={gnorm:.8f}")


def _parse_loss(out):
    for line in out.splitlines():
        if line.startswith("TRAINSTEP"):
            kv = dict(tok.split("=") for tok in line.split()[1:])
            return float(kv["loss"]), float(kv["grad_norm"])
    return None


def launch() -> int:
    procs = []
    env = dict(os.environ)
    cwd = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    for i in range(NUM_PROCESSES):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=cwd))
    # Single-process parity oracle runs alongside the workers.
    ref_proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "ref"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env, cwd=cwd)
    ok = 0
    losses = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        if p.returncode == 0 and "MULTIPROCESS OK" in out:
            ok += 1
            losses.append(_parse_loss(out))
        else:
            sys.stderr.write(f"--- worker {i} failed ---\n{out}\n")
    ref_out, _ = ref_proc.communicate(timeout=900)
    ref = _parse_loss(ref_out)
    print(f"{ok}/{NUM_PROCESSES} workers OK")
    if ref is None or ref_proc.returncode != 0:
        sys.stderr.write(f"--- reference failed ---\n{ref_out}\n")
        return 1
    if ok != NUM_PROCESSES:
        return 1
    # Multi-process DP loss/grad-norm must match the single-process
    # run (same math; tolerance covers cross-process f32 reduction
    # order).
    for i, (loss, gnorm) in enumerate(losses):
        dl = abs(loss - ref[0]) / max(abs(ref[0]), 1e-9)
        dg = abs(gnorm - ref[1]) / max(abs(ref[1]), 1e-9)
        print(f"worker {i}: loss rel-delta {dl:.2e}, "
              f"grad_norm rel-delta {dg:.2e} (ref loss {ref[0]:.6f})")
        if dl > 1e-5 or dg > 1e-4:
            sys.stderr.write("TRAIN PARITY FAILED\n")
            return 1
    print("TRAIN PARITY OK")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".."))
        if sys.argv[1] == "ref":
            reference(NUM_PROCESSES * DEVICES_PER_PROCESS)
        else:
            worker(int(sys.argv[1]))
    else:
        sys.exit(launch())
