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

    print(f"MULTIPROCESS OK process={process_id} "
          f"devices={jax.device_count()} mean={got}")


def launch() -> int:
    procs = []
    env = dict(os.environ)
    for i in range(NUM_PROCESSES):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
            cwd=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..")))
    ok = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        if p.returncode == 0 and "MULTIPROCESS OK" in out:
            ok += 1
        else:
            sys.stderr.write(f"--- worker {i} failed ---\n{out}\n")
    print(f"{ok}/{NUM_PROCESSES} workers OK")
    return 0 if ok == NUM_PROCESSES else 1


if __name__ == "__main__":
    if len(sys.argv) > 1:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".."))
        worker(int(sys.argv[1]))
    else:
        sys.exit(launch())
