"""Tensor parallelism over the mesh's reserved ``'model'`` axis.

The reference scales only by data parallelism (NCCL DP,
``pysot/utils/distributed.py``); the TPU-native design reserved a
``('data', 'model')`` mesh axis from round 1 (``parallel/mesh.py``).
This module makes that axis real for the parts of the flagship model
where tensor parallelism actually pays: the FC-heavy heads.

Design (the scaling-book recipe — annotate shardings, let XLA insert
the collectives):

- **What shards**: the Megatron column->row pattern on each 2-layer
  MLP block — the RoI box head (``Dense_0`` [12544, 1024] kernel
  sharded on its OUTPUT features, ``Dense_1`` [1024, 1024] on its
  INPUT features) and the Amodal Expander (``fc0`` / ``fc1``
  likewise).  The hidden activations stay sharded through the
  elementwise ReLU between the two layers; GSPMD inserts exactly one
  all-reduce per block (after the row-parallel matmul), riding ICI.
- **What stays replicated**: the conv trunk / FPN / RPN.  Conv TP at
  these channel widths (64..2048) would split already-MXU-underfilled
  contractions (stage1 runs at 23% MFU single-chip, BENCH_NOTES) and
  pay halo + all-reduce traffic on activation-dominated tensors —
  data parallelism over clips is the right axis there.  The FC heads
  are where per-device parameter memory concentrates (the box head's
  12544x1024 matmul is the single largest weight in the model).

No psum / collective appears in this file: the shardings below are
the whole implementation.  Correctness is validated by
``tests/test_tp.py`` (TP+DP train step vs the single-device oracle on
the virtual mesh) and the driver dryrun (``__graft_entry__.py``).
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

# (path substrings) -> PartitionSpec, matched against the flax param
# path.  Column-parallel kernels shard dim -1 (output features) and
# their biases shard with them; row-parallel kernels shard dim -2
# (input features) and keep replicated biases.
_TP_RULES = (
    (("box_head", "Dense_0", "kernel"), P(None, "model")),
    (("box_head", "Dense_0", "bias"), P("model")),
    (("box_head", "Dense_1", "kernel"), P("model", None)),
    (("expander", "fc0", "kernel"), P(None, "model")),
    (("expander", "fc0", "bias"), P("model")),
    (("expander", "fc1", "kernel"), P("model", None)),
)


def _spec_for(path_names, leaf, model_size):
    for keys, spec in _TP_RULES:
        if all(k in path_names for k in keys):
            # Only shard if the sharded dim divides evenly (flax
            # models at toy widths stay replicated rather than erroring).
            dim = [i for i, s in enumerate(spec) if s == "model"][0]
            if leaf.ndim > dim and leaf.shape[dim] % model_size == 0:
                return spec
            return P()
    return P()


def tp_param_shardings(variables, mesh):
    """A ``NamedSharding`` pytree for ``variables``: Megatron
    column->row TP on the FC heads over ``'model'``, replicated
    everywhere else.

    Works for the param tree of :class:`AmodalPipeline` (detector +
    expander) and any subtree of it; unknown leaves replicate, so the
    tree is always a valid placement.
    """
    model_size = mesh.shape["model"]

    def one(path, leaf):
        names = tuple(
            getattr(k, "key", getattr(k, "name", str(k)))
            for k in path)
        return NamedSharding(mesh, _spec_for(names, leaf, model_size))

    return jax.tree_util.tree_map_with_path(one, variables)


def place_tp(variables, mesh):
    """Device-put ``variables`` with :func:`tp_param_shardings`."""
    return jax.tree_util.tree_map(
        jax.device_put, variables, tp_param_shardings(variables, mesh))
