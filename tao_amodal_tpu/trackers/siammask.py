"""SiamMask tracking: SiamRPN localization + refined mask emission.

Capability-parity with the reference ``SiamMaskTracker``
(``pysot/tracker/siammask_tracker.py:33-79``): per frame, localize via
the RPN head exactly like SiamRPN, then run the mask head + refine
module at the best response position, emit the sigmoid mask, and
post-process it into a rotated-box polygon for VOT-style evaluation.

TPU-first: localization + mask refinement are ONE jitted step (the
refine position is a traced index); only the rotated-box fit runs on
host (numpy rotating calipers,
:mod:`tao_amodal_tpu.ops.rotated_box` — the reference shells out to
cv2 contours + minAreaRect).  Instead of warping the full mask to
image resolution and re-fitting (reference ``_crop_back``), the
polygon is fit in mask coordinates and its 4 corners are affine-mapped
to image coordinates — equivalent geometry without the image-sized
warp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.ops.rotated_box import mask_to_rotated_box
from tao_amodal_tpu.trackers.siamrpn import (
    SiamConfig,
    SiamRPNTracker,
    crop_subwindow,
    generate_anchors,
    hanning_window,
)


def make_siammask_step(model, params, cfg: SiamConfig = SiamConfig(),
                       mask_threshold=0.3):
    """(init_fn, step_fn); step returns (box, score, mask, sub_box).

    ``model`` must be a SiameseTracker with ``with_mask=True`` and
    ``with_refine=True``.
    """

    def _apply(method_kwargs):
        return model.apply(params, **method_kwargs, mutable=False)

    shape_out = jax.eval_shape(
        lambda z, x: _apply(dict(template=z, search=x, mode="track")),
        jax.ShapeDtypeStruct(
            (1, cfg.exemplar_size, cfg.exemplar_size, 3), jnp.float32),
        jax.ShapeDtypeStruct(
            (1, cfg.instance_size, cfg.instance_size, 3), jnp.float32))
    true_ss = shape_out["cls"].shape[1]
    anchors = generate_anchors(cfg, ss=true_ss)
    window = hanning_window(cfg, ss=true_ss)

    from tao_amodal_tpu.trackers.siamrpn import SiamState

    @jax.jit
    def init_fn(image, box_xywh):
        box = jnp.asarray(box_xywh, jnp.float32)
        center = jnp.array([box[0] + (box[2] - 1) / 2,
                            box[1] + (box[3] - 1) / 2])
        size = box[2:4]
        w_z = size[0] + cfg.context_amount * jnp.sum(size)
        h_z = size[1] + cfg.context_amount * jnp.sum(size)
        s_z = jnp.round(jnp.sqrt(w_z * h_z))
        channel_avg = jnp.mean(image.astype(jnp.float32), axis=(0, 1))
        z_crop = crop_subwindow(image, center, s_z, cfg.exemplar_size,
                                channel_avg)
        zf = _apply(dict(template=z_crop[None], mode="template"))
        return SiamState(center, size, channel_avg, zf)

    @jax.jit
    def step_fn(state: SiamState, image):
        w_z = state.size[0] + cfg.context_amount * jnp.sum(state.size)
        h_z = state.size[1] + cfg.context_amount * jnp.sum(state.size)
        s_z = jnp.sqrt(w_z * h_z)
        scale_z = cfg.exemplar_size / s_z
        s_x = jnp.round(s_z * (cfg.instance_size / cfg.exemplar_size))
        x_crop = crop_subwindow(image, state.center, s_x,
                                cfg.instance_size, state.channel_avg)
        out = _apply(dict(search=x_crop[None], zf=state.zf,
                          mode="track"))

        ss = true_ss
        A = len(cfg.ratios) * len(cfg.scales)
        cls = out["cls"][0].reshape(ss * ss, A, 2)
        score = jax.nn.softmax(cls, axis=-1)[..., 1]
        score = score.transpose(1, 0).reshape(-1)
        loc = out["loc"][0].reshape(ss * ss, A, 4)
        loc = loc.transpose(1, 0, 2).reshape(-1, 4)

        pred = jnp.stack([
            loc[:, 0] * anchors[:, 2] + anchors[:, 0],
            loc[:, 1] * anchors[:, 3] + anchors[:, 1],
            jnp.exp(jnp.clip(loc[:, 2], -10.0, 10.0)) * anchors[:, 2],
            jnp.exp(jnp.clip(loc[:, 3], -10.0, 10.0)) * anchors[:, 3],
        ], axis=0)

        def change(r):
            return jnp.maximum(r, 1.0 / r)

        def sz(w, h):
            pad = (w + h) * 0.5
            return jnp.sqrt((w + pad) * (h + pad))

        s_c = change(sz(pred[2], pred[3])
                     / sz(state.size[0] * scale_z,
                          state.size[1] * scale_z))
        r_c = change((state.size[0] / state.size[1])
                     / (pred[2] / pred[3]))
        penalty = jnp.exp(-(r_c * s_c - 1.0) * cfg.penalty_k)
        pscore = penalty * score
        pscore = (pscore * (1 - cfg.window_influence)
                  + window * cfg.window_influence)
        best = jnp.argmax(pscore)

        bbox = pred[:, best] / scale_z
        lr = penalty[best] * score[best] * cfg.lr
        cx = bbox[0] + state.center[0]
        cy = bbox[1] + state.center[1]
        width = state.size[0] * (1 - lr) + bbox[2] * lr
        height = state.size[1] * (1 - lr) + bbox[3] * lr
        H, W = image.shape[0], image.shape[1]
        cx = jnp.clip(cx, 0.0, W)
        cy = jnp.clip(cy, 0.0, H)
        width = jnp.clip(width, 10.0, W)
        height = jnp.clip(height, 10.0, H)

        # ---- mask branch (reference siammask_tracker.py:135-156) ----
        flat = best % (ss * ss)
        dy = flat // ss
        dx = flat % ss
        logits = model.apply(
            params, out["mask_corr"],
            jnp.stack([dy, dx])[None].astype(jnp.int32),
            method="refine")[0]
        mask = jax.nn.sigmoid(logits)  # [out, out]

        # The mask patch covers an exemplar-sized window of the search
        # crop centred at response cell (dy, dx); map to image coords.
        s = s_x / cfg.instance_size  # crop scale (img px per crop px)
        crop_x0 = state.center[0] - s_x / 2
        crop_y0 = state.center[1] - s_x / 2
        crop_cx = (dx.astype(jnp.float32) - ss // 2) * cfg.stride \
            + cfg.instance_size / 2
        crop_cy = (dy.astype(jnp.float32) - ss // 2) * cfg.stride \
            + cfg.instance_size / 2
        sub = jnp.stack([
            crop_x0 + (crop_cx - cfg.exemplar_size / 2) * s,
            crop_y0 + (crop_cy - cfg.exemplar_size / 2) * s,
            cfg.exemplar_size * s,
            cfg.exemplar_size * s,
        ])

        new_state = SiamState(jnp.stack([cx, cy]),
                              jnp.stack([width, height]),
                              state.channel_avg, state.zf)
        box = jnp.stack([cx - width / 2, cy - height / 2, width,
                         height])
        return new_state, (box, score[best], mask, sub)

    return init_fn, step_fn


class SiamMaskTracker(SiamRPNTracker):
    """Host wrapper: update() also fills ``last_mask`` (in-sub-window
    probabilities + its image-coords box) and ``last_polygon`` (the
    rotated-box corners flattened, reference ``polygon`` output)."""

    def __init__(self, model, params, cfg: SiamConfig = SiamConfig(),
                 mask_threshold=0.3):
        self.init_fn, self.step_fn = make_siammask_step(
            model, params, cfg, mask_threshold)
        self.mask_threshold = mask_threshold
        self.state = None
        self.last_mask = None
        self.last_mask_box = None
        self.last_polygon = None

    def update(self, image):
        self.state, (box, score, mask, sub) = self.step_fn(
            self.state, jnp.asarray(image))
        box = np.asarray(box)
        mask = np.asarray(mask)
        sub = np.asarray(sub)
        P = mask.shape[0]
        corners = mask_to_rotated_box(
            mask, threshold=self.mask_threshold,
            # fallback: the axis-aligned state box, in mask coords
            fallback_rect=[(box[0] - sub[0]) / sub[2] * P,
                           (box[1] - sub[1]) / sub[3] * P,
                           box[2] / sub[2] * P, box[3] / sub[3] * P])
        polygon = corners / P * sub[2:4][None] + sub[:2][None]
        self.last_mask = mask
        self.last_mask_box = sub
        self.last_polygon = polygon.reshape(-1)
        return box, float(score)
