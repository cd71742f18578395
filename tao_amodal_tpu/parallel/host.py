"""Multi-host data feeding.

Capability: the reference shards data per process with
``DistributedSampler`` (``pysot/tools/train.py:64-66``); on multi-host
TPU the equivalent is each host loading its shard of the global batch
and assembling a global jax.Array with
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def host_shard_indices(total, process_index=None, process_count=None):
    """This host's slice of a global batch of size ``total``."""
    pi = (jax.process_index() if process_index is None
          else process_index)
    pc = (jax.process_count() if process_count is None
          else process_count)
    assert total % pc == 0, (total, pc)
    per = total // pc
    return slice(pi * per, (pi + 1) * per)


def global_batch_from_local(mesh, local_batch, global_batch_size):
    """Assemble per-host numpy shards into one global sharded array
    pytree (leading axis sharded over 'data')."""
    sharding = NamedSharding(mesh, P("data"))

    def build(x):
        x = np.asarray(x)
        global_shape = (global_batch_size,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree_util.tree_map(build, local_batch)


class ShardedSampler:
    """Deterministic per-host sample-index sharding (the
    DistributedSampler capability): host h takes indices
    ``h::num_hosts`` of each shuffled epoch."""

    def __init__(self, num_samples, seed=0, process_index=None,
                 process_count=None):
        self.num_samples = num_samples
        self.seed = seed
        self.pi = (jax.process_index() if process_index is None
                   else process_index)
        self.pc = (jax.process_count() if process_count is None
                   else process_count)

    def epoch_indices(self, epoch):
        rng = np.random.RandomState(self.seed + epoch)
        order = rng.permutation(self.num_samples)
        return order[self.pi::self.pc]
