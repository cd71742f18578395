"""AmodalPipeline.batched == B independent streaming runs.

The multi-video serving path folds B videos' clips into one [B*T]
frame batch through the detector/expander and vmaps the SORT scan per
video; it must be exactly equivalent to running each video alone
(pipeline.py::AmodalPipeline.batched).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tao_amodal_tpu.pipeline import AmodalPipeline


@pytest.fixture(scope="module")
def tiny_pipeline():
    pipeline = AmodalPipeline.create(
        num_classes=8, num_dets=8, num_proposals=16,
        backbone_stages=(1, 1, 1, 1), dtype=jnp.float32,
        pre_nms_topk=20)
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.randint(0, 255, (3, 4, 64, 64, 3),
                                   np.uint8))
    flat = clips.reshape((12, 64, 64, 3))
    proc, _ = pipeline.preprocess(flat, out_size=(64, 64),
                                  use_pallas=False)
    proc = proc.reshape((3, 4) + proc.shape[1:]).astype(jnp.float32)
    variables = pipeline.init(jax.random.PRNGKey(0), proc[0, :2])
    return pipeline, variables, proc


def test_batched_matches_streaming(tiny_pipeline):
    pipeline, variables, proc = tiny_pipeline
    batched, states = jax.jit(pipeline.batched)(variables, proc)
    for b in range(proc.shape[0]):
        solo = jax.jit(lambda v, c: pipeline(v, c))(variables, proc[b])
        for key in solo:
            # Folding B*T frames into one batch changes XLA's fusion
            # choices, so floats differ at ~1e-4 (repo-wide device
            # tolerance 2e-3); ids/masks must match exactly.
            np.testing.assert_allclose(
                np.asarray(batched[key][b]), np.asarray(solo[key]),
                rtol=1e-4, atol=2e-3, err_msg=key)


def test_batched_threads_sort_state(tiny_pipeline):
    """Threading states across clip batches == one longer clip."""
    pipeline, variables, proc = tiny_pipeline
    first, states = jax.jit(pipeline.batched)(
        variables, proc[:, :2])
    second, _ = jax.jit(pipeline.batched)(
        variables, proc[:, 2:], sort_states=states)
    # Reference: per-video streaming over the full 4 frames.
    for b in range(proc.shape[0]):
        solo = jax.jit(lambda v, c: pipeline(v, c))(variables, proc[b])
        got_ids = np.concatenate([np.asarray(first["track_ids"][b]),
                                  np.asarray(second["track_ids"][b])])
        np.testing.assert_array_equal(got_ids,
                                      np.asarray(solo["track_ids"]))


def test_batched_matches_streaming_sort_on_visible(tiny_pipeline):
    """The sort_on='visible' association swap must preserve the
    batched == streaming equivalence (both paths pick the same
    association input)."""
    pipeline, variables, proc = tiny_pipeline
    pipe_vis = pipeline._replace(sort_on="visible")
    batched, _ = jax.jit(pipe_vis.batched)(variables, proc)
    solo = jax.jit(lambda v, c: pipe_vis(v, c))(variables, proc[1])
    np.testing.assert_allclose(np.asarray(batched["track_ids"][1]),
                               np.asarray(solo["track_ids"]))
    np.testing.assert_allclose(np.asarray(batched["boxes"][1]),
                               np.asarray(solo["boxes"]), rtol=2e-4,
                               atol=2e-3)
