"""Tensor parallelism over the 'model' mesh axis (parallel/tp.py).

Validates the Megatron column->row head sharding end to end on the
virtual 8-device mesh:

- the placement actually shards the documented kernels (no silent
  all-replicated pass);
- a TP forward of the full pipeline is exact vs replicated params;
- one hybrid TP+DP train step matches the single-device
  value_and_grad oracle (loss + grad norm) and leaves the updated
  head kernels sharded.

The reference has no TP anywhere (its only scale-out is NCCL data
parallelism, ``pysot/utils/distributed.py``); this is TPU-native
surface beyond the reference, riding the ('data', 'model') mesh that
``parallel/mesh.py`` reserved.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tao_amodal_tpu.parallel.dp import make_train_step
from tao_amodal_tpu.parallel.mesh import make_mesh, shard_batch
from tao_amodal_tpu.parallel.tp import place_tp, tp_param_shardings
from tao_amodal_tpu.pipeline import AmodalPipeline


def _toy_pipeline():
    return AmodalPipeline.create(
        num_classes=8, num_dets=16, num_proposals=32,
        backbone_stages=(1, 1, 1, 1))


@pytest.fixture(scope="module")
def setup():
    p = _toy_pipeline()
    clip = jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    variables = p.init(jax.random.PRNGKey(0), clip)
    mesh = make_mesh(data=2, model=4)
    return p, clip, variables, mesh


def test_placement_shards_the_heads(setup):
    _, _, variables, mesh = setup
    sh = tp_param_shardings(variables, mesh)
    d = sh["detector"]["params"]["box_head"]
    e = sh["expander"]["params"]
    assert d["Dense_0"]["kernel"].spec == P(None, "model")
    assert d["Dense_0"]["bias"].spec == P("model")
    assert d["Dense_1"]["kernel"].spec == P("model", None)
    assert e["fc0"]["kernel"].spec == P(None, "model")
    assert e["fc1"]["kernel"].spec == P("model", None)
    # trunk stays replicated
    assert (sh["detector"]["params"]["backbone"]["ConvBN_0"]["Conv_0"]
            ["kernel"].spec == P())
    n_sharded = sum(1 for s in jax.tree_util.tree_leaves(sh)
                    if s.spec != P())
    assert n_sharded == 6, n_sharded


def test_indivisible_widths_fall_back_to_replicated(setup):
    _, _, variables, _ = setup
    # model=3 does not divide 1024/512 evenly -> every rule must fall
    # back to replicated instead of erroring.
    devs = jax.devices()[:6]
    mesh = make_mesh(data=2, model=3, devices=devs)
    sh = tp_param_shardings(variables, mesh)
    assert all(s.spec == P() for s in jax.tree_util.tree_leaves(sh))


def test_tp_forward_matches_replicated(setup):
    p, clip, variables, mesh = setup
    vt = place_tp(variables, mesh)
    out_ref = jax.jit(lambda c: p(variables, c))(clip)
    out_tp = jax.jit(lambda c: p(vt, c))(clip)
    for key in ("boxes", "scores", "track_ids", "valid"):
        np.testing.assert_allclose(
            np.asarray(out_ref[key], np.float32),
            np.asarray(out_tp[key], np.float32), rtol=0, atol=1e-5,
            err_msg=key)


def test_tp_dp_train_step_matches_single_device(setup):
    import optax

    from tao_amodal_tpu.train.detector_loss import detector_train_loss
    from tao_amodal_tpu.train.optim import log_schedule, make_optimizer

    p, _, variables, mesh = setup
    B, H, W, G = 4, 64, 64, 4
    rng = np.random.RandomState(0)
    boxes = np.array([[4, 4, 30, 30], [10, 10, 50, 40],
                      [2, 8, 20, 60], [30, 30, 60, 60]], np.float32)
    amodal = np.array([[2, 2, 34, 34], [8, 8, 54, 44],
                       [0, 4, 24, 64], [26, 26, 64, 64]], np.float32)
    batch = {
        "images": rng.rand(B, H, W, 3).astype(np.float32),
        "gt_boxes": np.tile(boxes, (B, 1, 1)),
        "gt_amodal": np.tile(amodal, (B, 1, 1)),
        "gt_classes": np.ones((B, G), np.int32),
        "gt_valid": np.ones((B, G), bool),
    }

    def loss_fn(params, b, r):
        return detector_train_loss(p.detector, p.expander, params, b, r)

    sh = tp_param_shardings(variables, mesh)
    vt = place_tp(variables, mesh)
    optimizer = make_optimizer(log_schedule(1e-3, 1e-5, 100))
    # Built under jit from TP-placed params so param-shaped leaves
    # (adam mu/nu) inherit the sharded layout.
    opt_state = jax.jit(optimizer.init)(vt)
    step = make_train_step(loss_fn, optimizer, mesh, donate=False,
                           param_sharding=sh)
    state, metrics = step((vt, opt_state), shard_batch(mesh, batch),
                          jax.random.PRNGKey(1))
    loss_tp = float(metrics["loss"])
    gn_tp = float(metrics["grad_norm"])

    full = {k: jnp.asarray(v) for k, v in batch.items()}
    (loss_sd, _), grads_sd = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(variables, full, jax.random.PRNGKey(1))
    gn_sd = float(optax.global_norm(grads_sd))

    assert abs(loss_tp - float(loss_sd)) <= 1e-5, (loss_tp, loss_sd)
    assert abs(gn_tp - gn_sd) / max(gn_sd, 1.0) <= 1e-5, (gn_tp, gn_sd)

    # The updated head kernels are STILL sharded (the optimizer update
    # ran tensor-parallel; nothing silently gathered to replicated).
    ksh = (state[0]["detector"]["params"]["box_head"]["Dense_0"]
           ["kernel"].sharding)
    assert ksh.spec == P(None, "model"), ksh
