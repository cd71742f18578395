"""Batched constant-velocity Kalman filter for box tracking.

The SORT motion model (capability of reference
``visualization/tao/third_party/sort/sort.py:76-135``) vectorized over a
fixed bank of track slots: state ``[K, 7]`` = (cx, cy, s=area, r=aspect,
vcx, vcy, vs), covariance ``[K, 7, 7]``.  Predict/update are pure
einsums — the whole tracker bank advances in one fused XLA op, instead
of one Python ``KalmanFilter`` object per track.

Noise/covariance constants follow the reference's filterpy setup
(``sort.py:84-94``): R[2:,2:]*=10, P[4:,4:]*=1000, P*=10,
Q[-1,-1]*=0.01, Q[4:,4:]*=0.01.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DIM_X, DIM_Z = 7, 4


def _constants(dtype=jnp.float32):
    F = np.eye(DIM_X)
    for i in range(3):
        F[i, i + 4] = 1.0  # constant velocity on cx, cy, s
    H = np.zeros((DIM_Z, DIM_X))
    H[:4, :4] = np.eye(4)
    R = np.eye(DIM_Z)
    R[2:, 2:] *= 10.0
    P0 = np.eye(DIM_X)
    P0[4:, 4:] *= 1000.0
    P0 *= 10.0
    Q = np.eye(DIM_X)
    Q[-1, -1] *= 0.01
    Q[4:, 4:] *= 0.01
    return (jnp.asarray(F, dtype), jnp.asarray(H, dtype),
            jnp.asarray(R, dtype), jnp.asarray(P0, dtype),
            jnp.asarray(Q, dtype))


def bbox_to_z(boxes):
    """xyxy -> (cx, cy, area, aspect) measurement (``sort.py:49-60``)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + w / 2
    cy = boxes[..., 1] + h / 2
    s = w * h
    r = w / jnp.maximum(h, 1e-6)
    return jnp.stack([cx, cy, s, r], axis=-1)


def z_to_bbox(z):
    """(cx, cy, area, aspect) -> xyxy (``sort.py:63-73``)."""
    w = jnp.sqrt(jnp.maximum(z[..., 2] * z[..., 3], 0.0))
    h = z[..., 2] / jnp.maximum(w, 1e-6)
    return jnp.stack([z[..., 0] - w / 2, z[..., 1] - h / 2,
                      z[..., 0] + w / 2, z[..., 1] + h / 2], axis=-1)


def init_state(boxes, dtype=jnp.float32):
    """New-track states from detections: ``[K, 7]`` mean + ``[K,7,7]``."""
    _, _, _, P0, _ = _constants(dtype)
    z = bbox_to_z(boxes)
    x = jnp.concatenate([z, jnp.zeros(z.shape[:-1] + (3,), dtype)],
                        axis=-1)
    P = jnp.broadcast_to(P0, z.shape[:-1] + (DIM_X, DIM_X))
    return x, P


def predict(x, P):
    """Advance the whole bank one step.

    Includes the reference's guard zeroing the area velocity when the
    predicted area would go non-positive (``sort.py:106-108``).
    """
    F, _, _, _, Q = _constants(x.dtype)
    vs_bad = (x[..., 6] + x[..., 2]) <= 0
    x = x.at[..., 6].set(jnp.where(vs_bad, 0.0, x[..., 6]))
    x = jnp.einsum("ij,...j->...i", F, x)
    P = jnp.einsum("ij,...jk,lk->...il", F, P, F) + Q
    return x, P


def _inv4x4(m):
    """Closed-form batched 4x4 inverse (pair-of-2x2-subdeterminants
    expansion) — pure vectorized elementwise math.  ``linalg.inv`` on
    ``[K, 4, 4]`` lowers to batched LU with serial triangular solves,
    which is latency-bound on TPU (measured: dominates the whole SORT
    scan); this form is ~40 flops/matrix of VPU work."""
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]; d = m[..., 0, 3]  # noqa: E702
    e = m[..., 1, 0]; f = m[..., 1, 1]; g = m[..., 1, 2]; h = m[..., 1, 3]  # noqa: E702
    i = m[..., 2, 0]; j = m[..., 2, 1]; k = m[..., 2, 2]; l = m[..., 2, 3]  # noqa: E702,E741
    mm = m[..., 3, 0]; n = m[..., 3, 1]; o = m[..., 3, 2]; p = m[..., 3, 3]  # noqa: E702

    s0 = a * f - e * b
    s1 = a * g - e * c
    s2 = a * h - e * d
    s3 = b * g - f * c
    s4 = b * h - f * d
    s5 = c * h - g * d
    c5 = k * p - o * l
    c4 = j * p - n * l
    c3 = j * o - n * k
    c2 = i * p - mm * l
    c1 = i * o - mm * k
    c0 = i * n - mm * j

    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)

    r00 = (f * c5 - g * c4 + h * c3)
    r01 = (-b * c5 + c * c4 - d * c3)
    r02 = (n * s5 - o * s4 + p * s3)
    r03 = (-j * s5 + k * s4 - l * s3)
    r10 = (-e * c5 + g * c2 - h * c1)
    r11 = (a * c5 - c * c2 + d * c1)
    r12 = (-mm * s5 + o * s2 - p * s1)
    r13 = (i * s5 - k * s2 + l * s1)
    r20 = (e * c4 - f * c2 + h * c0)
    r21 = (-a * c4 + b * c2 - d * c0)
    r22 = (mm * s4 - n * s2 + p * s0)
    r23 = (-i * s4 + j * s2 - l * s0)
    r30 = (-e * c3 + f * c1 - g * c0)
    r31 = (a * c3 - b * c1 + c * c0)
    r32 = (-mm * s3 + n * s1 - o * s0)
    r33 = (i * s3 - j * s1 + k * s0)

    rows = [jnp.stack([r00, r01, r02, r03], axis=-1),
            jnp.stack([r10, r11, r12, r13], axis=-1),
            jnp.stack([r20, r21, r22, r23], axis=-1),
            jnp.stack([r30, r31, r32, r33], axis=-1)]
    return jnp.stack(rows, axis=-2) * inv_det[..., None, None]


def update(x, P, z, gate=None):
    """Measurement update; ``gate[K]`` False freezes a slot (no det)."""
    _, H, R, _, _ = _constants(x.dtype)
    y = z - jnp.einsum("ij,...j->...i", H, x)
    S = jnp.einsum("ij,...jk,lk->...il", H, P, H) + R
    K = jnp.einsum("...ij,kj,...kl->...il", P,
                   H, _inv4x4(S))
    x_new = x + jnp.einsum("...ij,...j->...i", K, y)
    I_KH = (jnp.eye(DIM_X, dtype=x.dtype)
            - jnp.einsum("...ij,jk->...ik", K, H))
    P_new = jnp.einsum("...ij,...jk->...ik", I_KH, P)
    if gate is not None:
        g = gate[..., None]
        x_new = jnp.where(g, x_new, x)
        P_new = jnp.where(g[..., None], P_new, P)
    return x_new, P_new


def state_to_bbox(x):
    return z_to_bbox(x[..., :4])
