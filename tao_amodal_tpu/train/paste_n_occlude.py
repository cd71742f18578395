"""PasteNOcclude: synthetic-occlusion augmentation for amodal training.

The TAO-Amodal method trains its Amodal Expander with synthetically
occluded targets: segmented "occluder" objects are pasted over visible
targets, shrinking the *visible* (modal) box while the amodal
regression target stays the full original box (paper arXiv 2312.12433;
the reference repo links the companion Amodal-Expander training stack,
``README.md:99``).

TPU-first implementation: occluders live in a fixed bank of RGBA
patches; pasting is a coordinate-mapped gather + alpha blend (no
dynamic shapes, vmaps over the batch), and the new visible boxes are
recomputed analytically from the paste geometry — all inside jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def paste_patch(image, patch_rgba, center, scale):
    """Alpha-blend one RGBA patch onto ``image`` at ``center``.

    patch coordinates map through (center, scale); out-of-patch samples
    are transparent.  Returns (image', occupancy_mask [H, W]).
    """
    H, W, _ = image.shape
    ph, pw, _ = patch_rgba.shape
    ys = (jnp.arange(H, dtype=jnp.float32) - center[1]) / scale \
        + ph / 2
    xs = (jnp.arange(W, dtype=jnp.float32) - center[0]) / scale \
        + pw / 2
    X, Y = jnp.meshgrid(xs, ys)
    inb = (X >= 0) & (X < pw - 1) & (Y >= 0) & (Y < ph - 1)
    x0 = jnp.clip(jnp.floor(X).astype(jnp.int32), 0, pw - 2)
    y0 = jnp.clip(jnp.floor(Y).astype(jnp.int32), 0, ph - 2)
    wx = (X - x0)[..., None]
    wy = (Y - y0)[..., None]
    p = patch_rgba
    sample = ((1 - wy) * ((1 - wx) * p[y0, x0] + wx * p[y0, x0 + 1])
              + wy * ((1 - wx) * p[y0 + 1, x0] + wx * p[y0 + 1, x0 + 1]))
    alpha = jnp.where(inb, sample[..., 3], 0.0)[..., None]
    rgb = sample[..., :3]
    out = image * (1 - alpha) + rgb * alpha
    return out, alpha[..., 0] > 0.5


def shrink_visible_box(box_xyxy, occ_mask):
    """Largest unoccluded sub-box: recompute the modal box from the
    per-row/column visibility inside the original box (analytic, no
    connected components — matches how box-level visibility is defined
    in the amodal annotations).

    Returns (new_box, visibility_fraction).
    """
    H, W = occ_mask.shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    in_box_y = (ys >= box_xyxy[1]) & (ys < box_xyxy[3])
    in_box_x = (xs >= box_xyxy[0]) & (xs < box_xyxy[2])
    region = in_box_y[:, None] & in_box_x[None, :]
    visible = region & ~occ_mask
    vis_count = jnp.sum(visible)
    area = jnp.maximum(jnp.sum(region), 1)
    visibility = vis_count / area

    any_row = jnp.any(visible, axis=1)
    any_col = jnp.any(visible, axis=0)
    big = jnp.float32(1e9)
    y0 = jnp.min(jnp.where(any_row, ys, big))
    y1 = jnp.max(jnp.where(any_row, ys, -big)) + 1
    x0 = jnp.min(jnp.where(any_col, xs, big))
    x1 = jnp.max(jnp.where(any_col, xs, -big)) + 1
    has = vis_count > 0
    new_box = jnp.where(has, jnp.array([x0, y0, x1, y1]), box_xyxy)
    return new_box, visibility


@partial(jax.jit, static_argnames=("max_occluders",))
def paste_n_occlude(image, target_box_xyxy, occluder_bank, rng,
                    max_occluders=3, scale_range=(0.5, 1.5),
                    occlude_prob=0.8):
    """Apply PasteNOcclude to one training sample.

    Args:
      image: ``[H, W, 3]`` float.
      target_box_xyxy: the target's full (amodal) box.
      occluder_bank: ``[K, ph, pw, 4]`` RGBA occluder patches.
      rng: PRNG key.

    Returns dict with ``image``, ``modal_box`` (shrunk visible box),
    ``amodal_box`` (unchanged target), ``visibility``.
    """
    K = occluder_bank.shape[0]
    H, W, _ = image.shape
    keys = jax.random.split(rng, max_occluders * 4 + 1)
    occ_mask = jnp.zeros((H, W), bool)

    cx = (target_box_xyxy[0] + target_box_xyxy[2]) / 2
    cy = (target_box_xyxy[1] + target_box_xyxy[3]) / 2
    bw = target_box_xyxy[2] - target_box_xyxy[0]
    bh = target_box_xyxy[3] - target_box_xyxy[1]

    for i in range(max_occluders):
        k1, k2, k3, k4 = keys[4 * i:4 * i + 4]
        do = jax.random.uniform(k1, ()) < occlude_prob
        idx = jax.random.randint(k2, (), 0, K)
        # Paste near the target boundary so it actually occludes.
        center = jnp.array([
            cx + jax.random.uniform(k3, (), minval=-0.6,
                                    maxval=0.6) * bw,
            cy + jax.random.uniform(k4, (), minval=-0.6,
                                    maxval=0.6) * bh,
        ])
        scale = jax.random.uniform(
            keys[-1], (), minval=scale_range[0],
            maxval=scale_range[1]) * jnp.sqrt(bw * bh) / jnp.sqrt(
                occluder_bank.shape[1] * occluder_bank.shape[2] + 1e-6)
        new_img, mask = paste_patch(image, occluder_bank[idx], center,
                                    jnp.maximum(scale, 1e-3))
        image = jnp.where(do, new_img, image)
        occ_mask = occ_mask | (mask & do)

    modal_box, visibility = shrink_visible_box(target_box_xyxy,
                                               occ_mask)
    return {"image": image, "modal_box": modal_box,
            "amodal_box": target_box_xyxy, "visibility": visibility,
            "occlusion_mask": occ_mask}


def make_occluder_bank(images_with_masks, patch_size=64):
    """Build the RGBA occluder bank from (image, mask) pairs (e.g.
    BURST masks): crops each object's bounding box, resizes to a fixed
    patch, alpha = mask."""
    import numpy as np

    bank = []
    for img, mask in images_with_masks:
        ys, xs = np.nonzero(mask)
        if len(ys) < 4:
            continue
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
        crop = img[y0:y1, x0:x1].astype(np.float32)
        alpha = mask[y0:y1, x0:x1].astype(np.float32)
        rgba = np.concatenate([crop, alpha[..., None]], axis=-1)
        rgba = np.asarray(jax.image.resize(
            jnp.asarray(rgba), (patch_size, patch_size, 4),
            method="linear"))
        bank.append(rgba)
    if not bank:
        raise ValueError("no usable occluders")
    import numpy as np

    return jnp.asarray(np.stack(bank))


def synthetic_occluder_bank(seed=0, num=16, patch_size=64):
    """Zero-egress occluder bank: textured ellipses in random colors.

    Stands in for the reference recipe's segmented-object occluders
    (built from real masks via :func:`make_occluder_bank`) when no real
    segments are available.  Elliptical alpha keeps the occluders
    shape-distinct from the synthetic datasets' rectangular targets so
    the detector's background class stays learnable.
    """
    import numpy as np

    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:patch_size, 0:patch_size].astype(np.float32)
    c = (patch_size - 1) / 2.0
    bank = []
    for _ in range(num):
        base = rs.uniform(30, 225, 3).astype(np.float32)
        tex = rs.uniform(-30, 30, (patch_size, patch_size, 3))
        rgb = np.clip(base[None, None] + tex, 0, 255)
        ry = rs.uniform(0.30, 0.49) * patch_size
        rx = rs.uniform(0.30, 0.49) * patch_size
        alpha = ((((yy - c) / ry) ** 2 + ((xx - c) / rx) ** 2)
                 <= 1.0).astype(np.float32)
        bank.append(np.concatenate([rgb, alpha[..., None]], axis=-1))
    return jnp.asarray(np.stack(bank), jnp.float32)


@partial(jax.jit, static_argnames=("max_occluders",))
def paste_n_occlude_batch(images, gt_boxes, gt_amodal, gt_valid,
                          occluder_bank, rng, max_occluders=3,
                          scale_range=(0.5, 1.5), occlude_prob=0.8):
    """PasteNOcclude over a detector training batch (all inside jit).

    Per sample: one random valid gt is the paste target (occluders
    land near it), then EVERY gt's visible box is re-shrunk against
    the composited occupancy mask — occluders shrink whatever they
    cover, exactly like the reference recipe's pasted segments.  The
    amodal targets are untouched; a gt whose visibility drops to zero
    is invalidated as a modal detection target (its visible box no
    longer exists).

    Args:
      images: ``[B, H, W, 3]`` float RGB in 0-255 (pre-normalization).
      gt_boxes / gt_amodal: ``[B, G, 4]`` xyxy.
      gt_valid: ``[B, G]`` bool.

    Returns ``(images, gt_boxes, gt_valid, visibility [B, G])``.
    """

    def one(image, boxes, amodal, valid, key):
        k_pick, k_paste = jax.random.split(key)
        u = jax.random.uniform(k_pick, valid.shape)
        idx = jnp.argmax(jnp.where(valid, u, -1.0))
        out = paste_n_occlude(image, amodal[idx], occluder_bank,
                              k_paste, max_occluders=max_occluders,
                              scale_range=scale_range,
                              occlude_prob=occlude_prob)
        any_valid = jnp.any(valid)
        image = jnp.where(any_valid, out["image"], image)
        occ = out["occlusion_mask"] & any_valid
        new_boxes, vis = jax.vmap(
            lambda b: shrink_visible_box(b, occ))(boxes)
        new_valid = valid & (vis > 0.0)
        return image, new_boxes.astype(boxes.dtype), new_valid, vis

    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(one)(images, gt_boxes, gt_amodal, gt_valid, keys)
