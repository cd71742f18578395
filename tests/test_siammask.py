"""SiamMask end-to-end: mask loss, rotated-box fit, tracker output,
and the VOT polygon-overlap path."""

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------- geometry

def test_min_area_rect_axis_aligned():
    from tao_amodal_tpu.ops.rotated_box import (
        min_area_rect,
        polygon_area,
    )

    pts = np.array([[0, 0], [10, 0], [10, 4], [0, 4], [5, 2]], float)
    rect = min_area_rect(pts)
    assert rect.shape == (4, 2)
    assert abs(polygon_area(rect) - 40.0) < 1e-6


def test_min_area_rect_rotated():
    from tao_amodal_tpu.ops.rotated_box import (
        min_area_rect,
        polygon_area,
    )

    # A 10 x 2 rectangle rotated 30 degrees: min-area rect must
    # recover area 20 (the axis-aligned bbox would be ~larger).
    t = np.deg2rad(30)
    R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    base = np.array([[x, y] for x in np.linspace(0, 10, 21)
                     for y in np.linspace(0, 2, 5)])
    pts = base @ R.T
    rect = min_area_rect(pts)
    assert abs(polygon_area(rect) - 20.0) < 0.5


def test_mask_to_rotated_box_fallback():
    from tao_amodal_tpu.ops.rotated_box import mask_to_rotated_box

    empty = np.zeros((63, 63))
    poly = mask_to_rotated_box(empty, fallback_rect=[2, 3, 10, 6])
    np.testing.assert_allclose(
        poly, [[2, 3], [12, 3], [12, 9], [2, 9]])


# ------------------------------------------------------------ mask loss

def test_mask_loss_patch_alignment():
    """The loss must extract the GT patch centred at each response
    location: perfect logits => near-zero loss; inverted => large."""
    from tao_amodal_tpu.train.siamese_loss import (
        select_mask_logistic_loss,
    )

    B, S, P = 1, 5, 16
    stride, down = 8, 2
    Hs = 64
    rs = np.random.RandomState(0)
    gt = (rs.rand(B, Hs, Hs) > 0.5).astype(np.float32)

    # Build the patches the same way the loss should see them.
    g = jax.image.resize(jnp.asarray(gt), (B, Hs // down, Hs // down),
                         method="nearest")
    eff = stride // down
    span = (S - 1) * eff + P
    pad = max(0, span - g.shape[1])
    lo = pad // 2
    g = jnp.pad(g, ((0, 0), (lo, pad - lo), (lo, pad - lo)))
    patches = jax.lax.conv_general_dilated_patches(
        g[..., None], (P, P), (eff, eff), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    perfect = (2.0 * patches - 1.0) * 20.0  # +-20 logits
    pw = jnp.ones((B, S, S)) / (S * S)
    loss_good = float(select_mask_logistic_loss(
        perfect, jnp.asarray(gt), pw, stride=stride, down=down))
    loss_bad = float(select_mask_logistic_loss(
        -perfect, jnp.asarray(gt), pw, stride=stride, down=down))
    assert loss_good < 1e-6
    assert loss_bad > 5.0


def test_mask_loss_trains():
    """One gradient step on the mask head must reduce the loss."""
    from tao_amodal_tpu.train.siamese_loss import (
        select_mask_logistic_loss,
    )

    rs = np.random.RandomState(1)
    B, S = 2, 5
    P = 32
    gt = (rs.rand(B, 64, 64) > 0.6).astype(np.float32)
    logits0 = jnp.asarray(rs.randn(B, S, S, P * P), jnp.float32)
    pw = jnp.asarray(rs.rand(B, S, S), jnp.float32)

    def loss_fn(lg):
        return select_mask_logistic_loss(lg, jnp.asarray(gt), pw)

    l0, g = jax.value_and_grad(loss_fn)(logits0)
    l1 = loss_fn(logits0 - 0.5 * g)
    assert float(l1) < float(l0)


def test_siamese_loss_includes_mask_branch():
    from tao_amodal_tpu.train.siamese_loss import siamese_loss

    rs = np.random.RandomState(2)
    B, S, A = 2, 5, 5
    outputs = {
        "cls": jnp.asarray(rs.randn(B, S, S, 2 * A), jnp.float32),
        "loc": jnp.asarray(rs.randn(B, S, S, 4 * A), jnp.float32),
        "mask": jnp.asarray(rs.randn(B, S, S, 63 * 63), jnp.float32),
    }
    N = A * S * S
    targets = {
        "label": jnp.zeros((B, N)),
        "pos_weight": jnp.asarray(rs.rand(B, N) * 0.01, jnp.float32),
        "neg_weight": jnp.asarray(rs.rand(B, N) * 0.01, jnp.float32),
        "delta": jnp.zeros((B, N, 4)),
        "mask_label": jnp.asarray(
            (rs.rand(B, 255, 255) > 0.5), jnp.float32),
    }
    total, stats = siamese_loss(outputs, targets)
    assert "mask_loss" in stats
    assert np.isfinite(float(total))


# -------------------------------------------------------------- tracker

def _moving_square_seq(T=4, H=160, W=160, size=40, step=5):
    frames, boxes = [], []
    for t in range(T):
        img = np.full((H, W, 3), 40, np.uint8)
        x, y = 30 + step * t, 45 + step * t
        img[y:y + size, x:x + size] = [220, 60, 60]
        frames.append(img)
        boxes.append([x, y, size, size])
    return frames, boxes


def test_siammask_tracker_emits_masks_and_polygons():
    from tao_amodal_tpu.trackers.factory import build_tracker
    from tao_amodal_tpu.trackers.siamrpn import SiamConfig

    cfg = SiamConfig(exemplar_size=64, instance_size=128, base_size=0,
                     stride=8)
    tracker = build_tracker("siammask", config=cfg)
    frames, gt = _moving_square_seq()
    tracker.init(frames[0], gt[0])
    for f in frames[1:]:
        box, score = tracker.update(f)
    assert np.all(np.isfinite(box))
    # Mask + polygon surfaces (reference SiamMaskTracker outputs).
    assert tracker.last_mask is not None
    assert tracker.last_mask.ndim == 2
    assert tracker.last_mask.shape[0] == tracker.last_mask.shape[1]
    assert tracker.last_polygon.shape == (8,)
    assert np.all(np.isfinite(tracker.last_polygon))


def test_vot_protocol_consumes_polygons(tmp_path):
    """The VOT restart harness must run a polygon-emitting tracker
    through the native region-overlap path."""
    from PIL import Image

    from tao_amodal_tpu.cli.sot_cli import run_vot_protocol
    from tao_amodal_tpu.data.sot_datasets import load_sot_dataset
    from tao_amodal_tpu.trackers.factory import build_tracker
    from tao_amodal_tpu.trackers.siamrpn import SiamConfig

    root = tmp_path / "vot"
    seq_dir = root / "seq0" / "color"
    seq_dir.mkdir(parents=True)
    frames, gt = _moving_square_seq(T=4)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(seq_dir / f"{i:08d}.jpg")
    np.savetxt(root / "seq0" / "groundtruth.txt",
               np.asarray(gt, float), delimiter=",", fmt="%.1f")

    dataset = load_sot_dataset("vot", str(root))
    cfg = SiamConfig(exemplar_size=64, instance_size=128, base_size=0,
                     stride=8)
    tracker = build_tracker("siammask", config=cfg)
    summary = run_vot_protocol(tracker, dataset, str(tmp_path / "res"),
                               tracker_name="siammask")
    assert "seq0" in summary
    assert np.isfinite(summary["seq0"]["accuracy"])
