"""End-to-end SOT tracker smoke tests on synthetic moving targets."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest


def _moving_square_seq(T=6, H=160, W=160, size=36, step=6):
    frames = []
    boxes = []
    for t in range(T):
        img = np.full((H, W, 3), 40, np.uint8)
        x = 30 + step * t
        y = 45 + (step // 2) * t
        img[y:y + size, x:x + size] = [220, 60, 60]
        frames.append(img)
        boxes.append([x, y, size, size])
    return frames, boxes


def test_siamrpn_tracker_follows_target():
    from tao_amodal_tpu.models.siamese import SiameseTracker
    from tao_amodal_tpu.trackers.siamrpn import (
        SiamConfig,
        SiamRPNTracker,
    )

    cfg = SiamConfig(exemplar_size=64, instance_size=128, base_size=0,
                     stride=8)
    model = SiameseTracker(num_levels=3)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((1, cfg.exemplar_size, cfg.exemplar_size, 3))
    x = jnp.zeros((1, cfg.instance_size, cfg.instance_size, 3))
    params = model.init(rng, template=z, search=x, mode="train")

    tracker = SiamRPNTracker(model, params, cfg)
    frames, gt = _moving_square_seq()
    boxes, scores, _ = tracker.track(frames, gt[0])
    assert boxes.shape == (len(frames), 4)
    assert np.all(np.isfinite(boxes))
    # With random weights we only require sane geometry (positive size,
    # inside frame) — the functional contract, not accuracy.
    assert (boxes[:, 2] > 0).all() and (boxes[:, 3] > 0).all()


class _TinyExtractor(nn.Module):
    @nn.compact
    def __call__(self, crop):
        x = crop[None] / 255.0
        for feats, stride in ((16, 2), (32, 2), (32, 2), (32, 2)):
            x = nn.Conv(feats, (3, 3), strides=stride,
                        padding="SAME")(x)
            x = nn.relu(x)
        return x[0]


@pytest.mark.slow
def test_dimp_tracker_runs():
    from tao_amodal_tpu.models.dimp import IoUNet
    from tao_amodal_tpu.trackers.dimp import DimpTracker

    rng = jax.random.PRNGKey(0)
    extractor = _TinyExtractor()
    S = 96
    ex_vars = extractor.init(rng, jnp.zeros((S, S, 3)))

    def extract(crop):
        return extractor.apply(ex_vars, crop)

    iou_net = IoUNet(features=32, pool_size=3)
    feat_hw = S // 16
    iou_vars = iou_net.init(
        rng, jnp.zeros((feat_hw, feat_hw, 32)), jnp.zeros((3 * 3 * 32,)),
        jnp.zeros((1, 4)), spatial_scale=1.0)

    tracker = DimpTracker(extract, iou_net, iou_vars, search_size=S,
                          filter_size=3, feat_stride=16, memory_size=4,
                          update_interval=3)
    frames, gt = _moving_square_seq(T=5, H=128, W=128)
    boxes, scores, _ = tracker.track(frames, gt[0])
    assert boxes.shape == (5, 4)
    assert np.all(np.isfinite(boxes))


def test_track_clip_scan_matches_stepwise():
    """lax.scan clip tracking must equal the per-frame host loop."""
    from tao_amodal_tpu.models.siamese import SiameseTracker
    from tao_amodal_tpu.trackers.siamrpn import (
        SiamConfig,
        make_siamrpn_step,
        track_clip,
    )

    cfg = SiamConfig(exemplar_size=64, instance_size=128, base_size=0)
    model = SiameseTracker(num_levels=3)
    rng = jax.random.PRNGKey(1)
    z = jnp.zeros((1, 64, 64, 3))
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(rng, template=z, search=x, mode="train")
    init_fn, step_fn = make_siamrpn_step(model, params, cfg)

    frames, gt = _moving_square_seq(T=4, H=128, W=128)
    clip = jnp.asarray(np.stack(frames))
    boxes_scan, scores_scan = track_clip(init_fn, step_fn, clip, gt[0])

    state = init_fn(clip[0], np.asarray(gt[0], np.float32))
    boxes_loop = [np.asarray(gt[0], np.float32)]
    for t in range(1, 4):
        state, (box, _) = step_fn(state, clip[t])
        boxes_loop.append(np.asarray(box))
    np.testing.assert_allclose(np.asarray(boxes_scan),
                               np.stack(boxes_loop), atol=1e-3)
