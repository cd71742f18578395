"""Device mesh construction.

Replaces ``dist_init`` (reference ``pysot/utils/distributed.py:76-112``,
rank/world from env + NCCL groups): there is no process-group
handshake — the mesh comes straight from ``jax.devices()`` and the
sharding annotations do the rest.  The 2-D ``('data', 'model')`` layout
carries a tensor-parallel axis: ``parallel/tp.py`` shards the FC-heavy
heads over ``'model'`` (Megatron column->row), everything else rides
data parallelism (survey §2d).  On multi-slice systems the data axis
should map to DCN and model to ICI (fastest varying).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data=None, model=1, devices=None):
    """Build a ``('data', 'model')`` mesh over the available devices.

    Args:
      data: data-parallel axis size (default: all devices / model).
      model: model-parallel axis size.

    Returns a :class:`jax.sharding.Mesh`.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh):
    """Shard the leading (batch/time) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place a host batch pytree with the leading axis sharded on
    'data' (the DistributedSampler equivalent)."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)
