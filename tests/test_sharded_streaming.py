"""make_sharded_streaming == per-video streaming, on a real 8-way mesh.

The pod-scale SERVING path (pipeline.py::make_sharded_streaming) runs B
video lanes sharded over the mesh's 'data' axis with each lane's SORT
state threaded across its clips.  It must be exactly equivalent to
running every video alone through AmodalPipeline.streaming — track ids
included, across clip boundaries (reference semantics: stateful
per-video trackers, ``trackers/sot/base.py:59-102``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tao_amodal_tpu.parallel.mesh import make_mesh
from tao_amodal_tpu.pipeline import AmodalPipeline, make_sharded_streaming

B, T, CLIPS = 8, 4, 2


@pytest.fixture(scope="module")
def setup():
    pipeline = AmodalPipeline.create(
        num_classes=8, num_dets=8, num_proposals=16,
        backbone_stages=(1, 1, 1, 1), dtype=jnp.float32,
        pre_nms_topk=20)
    rs = np.random.RandomState(0)
    flat = jnp.asarray(rs.randint(0, 255, (B * CLIPS * T, 64, 64, 3),
                                  np.uint8))
    proc, _ = pipeline.preprocess(flat, out_size=(64, 64),
                                  use_pallas=False)
    # [B, CLIPS, T, H, W, C] float32 clips, one video per lane.
    proc = proc.reshape((B, CLIPS, T) + proc.shape[1:]).astype(
        jnp.float32)
    variables = pipeline.init(jax.random.PRNGKey(0), proc[0, 0, :2])
    return pipeline, variables, proc


def test_sharded_streaming_matches_solo(setup):
    pipeline, variables, proc = setup
    mesh = make_mesh(data=8, model=1)
    init_states, run = make_sharded_streaming(pipeline, variables, mesh)

    states = init_states()
    outs = []
    for j in range(CLIPS):
        out, states = run(proc[:, j], states)
        outs.append(jax.tree_util.tree_map(np.asarray, out))

    # Oracle: each lane's video alone, SORT state threaded per clip.
    for b in range(B):
        state = pipeline.init_tracker_state()
        for j in range(CLIPS):
            solo, state = jax.jit(pipeline.streaming)(
                variables, proc[b, j], state)
            np.testing.assert_array_equal(
                outs[j]["track_ids"][b],
                np.asarray(solo["track_ids"]),
                err_msg=f"lane {b} clip {j}")
            np.testing.assert_allclose(
                outs[j]["boxes"][b], np.asarray(solo["boxes"]),
                rtol=1e-4, atol=2e-3, err_msg=f"lane {b} clip {j}")


def test_sharded_streaming_lane_layout(setup):
    """Clips and states actually land sharded over the 'data' axis
    (one lane per device), params replicated — zero collectives."""
    pipeline, variables, proc = setup
    mesh = make_mesh(data=8, model=1)
    init_states, run = make_sharded_streaming(pipeline, variables, mesh)
    out, states = run(proc[:, 0], init_states())
    shard_devs = {s.device for s in out["track_ids"].addressable_shards}
    assert len(shard_devs) == 8
    leaf = jax.tree_util.tree_leaves(states)[0]
    assert len({s.device for s in leaf.addressable_shards}) == 8
