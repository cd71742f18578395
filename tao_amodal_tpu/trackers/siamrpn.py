"""SiamRPN++ tracking: the whole per-frame step is ONE jitted program.

Capability-parity with the reference tracker
(``pysot/tracker/siamrpn_tracker.py:93-160`` + the subwindow crop at
``base_tracker.py:38``), redesigned TPU-first:

  * subwindow crop = coordinate-mapped bilinear gather with pad-value
    masking — handles the dynamic crop size with static output shapes
    (no host cv2 round-trip per frame);
  * anchor decode, scale/ratio penalties, Hanning window smoothing,
    argmax and the smoothed state update are all inside the jit; the
    tracker state (center, size, cached template features, channel
    average) is a pytree carried frame to frame;
  * a whole clip can therefore run as ``lax.scan`` over frames
    (:func:`track_clip`) — zero host sync until the end.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.trackers.base import Tracker


class SiamConfig(NamedTuple):
    """Tracking hyperparameters (reference ``config.py`` TRACK/ANCHOR)."""

    exemplar_size: int = 127
    instance_size: int = 255
    base_size: int = 8
    context_amount: float = 0.5
    stride: int = 8
    ratios: tuple = (0.33, 0.5, 1.0, 2.0, 3.0)
    scales: tuple = (8,)
    penalty_k: float = 0.04
    window_influence: float = 0.44
    lr: float = 0.4


def score_size(cfg: SiamConfig):
    """Nominal response size (reference formula,
    ``siamrpn_tracker.py:19-20``).  The tracker derives the REAL size
    from the model with ``jax.eval_shape`` — our conv arithmetic
    (SAME-padded stem) differs from torch's by a pixel or two."""
    return ((cfg.instance_size - cfg.exemplar_size) // cfg.stride + 1
            + cfg.base_size)


def generate_anchors(cfg: SiamConfig, ss=None):
    """Anchor grid ``[A*S*S, 4]`` as (cx, cy, w, h), matching reference
    ``generate_anchor`` (``siamrpn_tracker.py:29-45``)."""
    if ss is None:
        ss = score_size(cfg)
    anchors = []
    for r in cfg.ratios:
        for s in cfg.scales:
            base = cfg.stride * s
            w = int(np.sqrt(base * base / r))
            h = int(w * r)
            anchors.append([w, h])
    anchors = np.array(anchors, np.float32)  # [A, 2]
    A = len(anchors)
    ori = -(ss // 2) * cfg.stride
    xx, yy = np.meshgrid(ori + cfg.stride * np.arange(ss),
                         ori + cfg.stride * np.arange(ss))
    grid = np.stack([xx, yy], -1).reshape(-1, 2).astype(np.float32)
    out = np.zeros((A, ss * ss, 4), np.float32)
    out[:, :, :2] = grid[None]
    out[:, :, 2:] = anchors[:, None, :]
    return jnp.asarray(out.reshape(-1, 4))


def hanning_window(cfg: SiamConfig, ss=None):
    if ss is None:
        ss = score_size(cfg)
    h = np.hanning(ss)
    win = np.outer(h, h).reshape(-1)
    return jnp.asarray(np.tile(win, len(cfg.ratios) * len(cfg.scales)),
                       jnp.float32)


def crop_subwindow(image, center, crop_size, out_size, pad_value):
    """Square crop of dynamic size -> fixed ``out_size``, bilinear.

    Output pixel u maps to image coordinate
    ``center - crop_size/2 + (u + 0.5) * crop_size/out_size - 0.5``;
    out-of-bounds samples take ``pad_value`` per channel.  Equivalent
    to the reference's pad+crop+cv2.resize (``base_tracker.py:38-76``)
    in one gather.
    """
    H, W, _ = image.shape
    u = (jnp.arange(out_size, dtype=jnp.float32) + 0.5)
    scale = crop_size / out_size
    xs = center[0] - crop_size / 2 + u * scale - 0.5
    ys = center[1] - crop_size / 2 + u * scale - 0.5
    X, Y = jnp.meshgrid(xs, ys)

    x0 = jnp.floor(X)
    y0 = jnp.floor(Y)
    wx = (X - x0)[..., None]
    wy = (Y - y0)[..., None]

    def fetch(yi, xi):
        inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = image[yc, xc].astype(jnp.float32)
        return jnp.where(inb[..., None], vals, pad_value)

    f00 = fetch(y0, x0)
    f01 = fetch(y0, x0 + 1)
    f10 = fetch(y0 + 1, x0)
    f11 = fetch(y0 + 1, x0 + 1)
    return ((1 - wy) * ((1 - wx) * f00 + wx * f01)
            + wy * ((1 - wx) * f10 + wx * f11))


class SiamState(NamedTuple):
    center: jax.Array       # [2] (cx, cy)
    size: jax.Array         # [2] (w, h)
    channel_avg: jax.Array  # [3]
    zf: Any                 # cached template features (pytree)


def _make_siamrpn_core(model, params, cfg: SiamConfig = SiamConfig()):
    """Build ``(init_fn, step_hp)`` — the shared tracking core with the
    (penalty_k, window_influence, lr) triple as a TRACED argument, so
    both the fixed-config step and the vmapped hyperparameter sweep
    close over one implementation."""
    def _apply(method_kwargs):
        return model.apply(params, **method_kwargs,
                           mutable=False)

    # True response size from the model itself (conv-arithmetic-proof).
    shape_out = jax.eval_shape(
        lambda z, x: _apply(dict(template=z, search=x, mode="track")),
        jax.ShapeDtypeStruct(
            (1, cfg.exemplar_size, cfg.exemplar_size, 3), jnp.float32),
        jax.ShapeDtypeStruct(
            (1, cfg.instance_size, cfg.instance_size, 3), jnp.float32))
    true_ss = shape_out["cls"].shape[1]
    anchors = generate_anchors(cfg, ss=true_ss)
    window = hanning_window(cfg, ss=true_ss)

    @jax.jit
    def init_fn(image, box_xywh):
        """box in xywh; returns initial SiamState."""
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

    def step_hp(state: SiamState, image, hp):
        """One frame with traced tracking hyperparameters.

        ``hp``: ``[3]`` array ``(penalty_k, window_influence, lr)`` —
        traced (not baked), so a whole hyperparameter grid can vmap
        over this axis in one program (:func:`make_siamrpn_hp_sweep`).
        """
        penalty_k, window_influence, cfg_lr = hp[0], hp[1], hp[2]
        w_z = state.size[0] + cfg.context_amount * jnp.sum(state.size)
        h_z = state.size[1] + cfg.context_amount * jnp.sum(state.size)
        s_z = jnp.sqrt(w_z * h_z)
        scale_z = cfg.exemplar_size / s_z
        s_x = s_z * (cfg.instance_size / cfg.exemplar_size)
        x_crop = crop_subwindow(image, state.center, jnp.round(s_x),
                                cfg.instance_size, state.channel_avg)
        out = _apply(dict(search=x_crop[None], zf=state.zf,
                          mode="track"))

        ss = true_ss
        A = len(cfg.ratios) * len(cfg.scales)
        # cls [1, ss, ss, 2A] -> softmax fg prob per anchor, flattened
        # anchor-major to match the anchor layout.
        cls = out["cls"][0].reshape(ss * ss, A, 2)
        score = jax.nn.softmax(cls, axis=-1)[..., 1]
        score = score.transpose(1, 0).reshape(-1)  # [A*ss*ss]
        loc = out["loc"][0].reshape(ss * ss, A, 4)
        loc = loc.transpose(1, 0, 2).reshape(-1, 4)

        # Anchor decode (reference ``_convert_bbox``); the exp deltas
        # are clamped for numerical safety (inf/NaN-proof with
        # untrained heads; no effect on trained models).
        pred = jnp.stack([
            loc[:, 0] * anchors[:, 2] + anchors[:, 0],
            loc[:, 1] * anchors[:, 3] + anchors[:, 1],
            jnp.exp(jnp.clip(loc[:, 2], -10.0, 10.0)) * anchors[:, 2],
            jnp.exp(jnp.clip(loc[:, 3], -10.0, 10.0)) * anchors[:, 3],
        ], axis=0)  # [4, N]

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
        penalty = jnp.exp(-(r_c * s_c - 1.0) * penalty_k)
        pscore = penalty * score
        pscore = (pscore * (1 - window_influence)
                  + window * window_influence)
        best = jnp.argmax(pscore)

        bbox = pred[:, best] / scale_z
        lr = penalty[best] * score[best] * cfg_lr
        cx = bbox[0] + state.center[0]
        cy = bbox[1] + state.center[1]
        width = state.size[0] * (1 - lr) + bbox[2] * lr
        height = state.size[1] * (1 - lr) + bbox[3] * lr

        H, W = image.shape[0], image.shape[1]
        cx = jnp.clip(cx, 0.0, W)
        cy = jnp.clip(cy, 0.0, H)
        width = jnp.clip(width, 10.0, W)
        height = jnp.clip(height, 10.0, H)

        new_state = SiamState(jnp.stack([cx, cy]),
                              jnp.stack([width, height]),
                              state.channel_avg, state.zf)
        box = jnp.stack([cx - width / 2, cy - height / 2, width, height])
        return new_state, (box, score[best])

    return init_fn, step_hp


def make_siamrpn_step(model, params, cfg: SiamConfig = SiamConfig()):
    """Build (init_fn, step_fn), both jittable.

    ``model`` is a :class:`~tao_amodal_tpu.models.siamese.SiameseTracker`
    linen module; ``params`` its variables.
    """
    init_fn, step_hp = _make_siamrpn_core(model, params, cfg)
    hp0 = jnp.asarray([cfg.penalty_k, cfg.window_influence, cfg.lr],
                      jnp.float32)

    @jax.jit
    def step_fn(state: SiamState, image):
        """One frame -> (new_state, (box_xywh, best_score))."""
        return step_hp(state, image, hp0)

    return init_fn, step_fn


def make_siamrpn_hp_sweep(model, params, cfg: SiamConfig = SiamConfig()):
    """Whole-hyperparameter-grid tracking in ONE device program.

    The reference sweeps (penalty_k, window_influence, lr) as a queue
    of independent GPU jobs, one full tracker run per cell
    (``pysot/tools/hp_search.py``).  TPU-first, the grid IS a batch
    axis: N trackers advance in lockstep — each frame runs the
    backbone/xcorr/penalty math for all N cells as one batched program
    (vmap over the hp axis), and ``lax.scan`` carries the N tracker
    states over the clip.  The template is embedded once and shared.

    Returns ``sweep_fn(frames [T, H, W, 3], init_box, hp_grid [N, 3])
    -> (boxes [N, T, 4], scores [N, T])``, jittable.
    """
    init_fn, step_hp = _make_siamrpn_core(model, params, cfg)

    @jax.jit
    def sweep_fn(frames, init_box, hp_grid):
        state0 = init_fn(frames[0], init_box)
        N = hp_grid.shape[0]
        states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (N,) + x.shape), state0)

        def scan_body(states, frame):
            new_states, (box, score) = jax.vmap(
                step_hp, in_axes=(0, None, 0))(states, frame, hp_grid)
            return new_states, (box, score)

        _, (boxes, scores) = jax.lax.scan(scan_body, states, frames[1:])
        first = jnp.broadcast_to(
            jnp.asarray(init_box, jnp.float32), (1, N, 4))
        boxes = jnp.concatenate([first, boxes])         # [T, N, 4]
        scores = jnp.concatenate([jnp.ones((1, N)), scores])
        return boxes.transpose(1, 0, 2), scores.transpose(1, 0)

    return sweep_fn


def track_clip(init_fn, step_fn, frames, init_box):
    """Track through ``frames [T, H, W, 3]`` with lax.scan — the whole
    clip is one device program (amortizes all dispatch overhead)."""
    state0 = init_fn(frames[0], init_box)

    def scan_body(state, frame):
        new_state, (box, score) = step_fn(state, frame)
        return new_state, (box, score)

    _, (boxes, scores) = jax.lax.scan(scan_body, state0, frames[1:])
    first = jnp.asarray(init_box, jnp.float32)[None]
    return (jnp.concatenate([first, boxes]),
            jnp.concatenate([jnp.ones((1,)), scores]))


class SiamRPNTracker(Tracker):
    """Host-facing wrapper with the reference Tracker API."""

    def __init__(self, model, params, cfg: SiamConfig = SiamConfig()):
        self.model, self.params, self.cfg = model, params, cfg
        self.init_fn, self.step_fn = make_siamrpn_step(model, params, cfg)
        self.state = None

    def init(self, image, box):
        self.state = self.init_fn(jnp.asarray(image), np.asarray(box))

    def update(self, image):
        self.state, (box, score) = self.step_fn(self.state,
                                                jnp.asarray(image))
        return np.asarray(box), float(score)
