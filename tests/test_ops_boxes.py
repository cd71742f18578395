import numpy as np

from tao_amodal_tpu.ops.boxes import (
    box_intersect_union,
    box_iou_matrix,
    xywh_to_xyxy,
    xyxy_to_xywh,
)


def test_intersect_union_reference_values():
    # Values from the reference doctest spec
    # (tao_amodal/evaluation/tao_amodal/eval.py:21-30).
    cases = [
        ([0, 0, 20, 20], [0, 0, 20, 20], (400, 400)),
        ([0, 0, 20, 20], [0, 0, 10, 10], (100, 400)),
        ([0, 0, 20, 20], [0, 0, 30, 30], (400, 900)),
        ([10, 20, 10, 10], [10, 20, 5, 5], (25, 100)),
    ]
    for d, g, (i_exp, u_exp) in cases:
        i, u = box_intersect_union(np.array(d, float), np.array(g, float),
                                   xp=np)
        assert i == i_exp
        assert u == u_exp


def test_iou_matrix_vs_bruteforce():
    rng = np.random.RandomState(0)
    dt = np.abs(rng.randn(13, 4)) * 50
    gt = np.abs(rng.randn(7, 4)) * 50
    got = np.asarray(box_iou_matrix(dt, gt, xp=np))
    for i in range(13):
        for j in range(7):
            ii, uu = box_intersect_union(dt[i], gt[j], xp=np)
            exp = ii / uu if uu > 0 else 0.0
            assert abs(got[i, j] - exp) < 1e-12


def test_iou_crowd_denominator():
    dt = np.array([[0.0, 0, 10, 10]])
    gt = np.array([[0.0, 0, 20, 20]])
    plain = np.asarray(box_iou_matrix(dt, gt, xp=np))[0, 0]
    crowd = np.asarray(box_iou_matrix(dt, gt, iscrowd=[True], xp=np))[0, 0]
    assert abs(plain - 100 / 400) < 1e-12
    assert abs(crowd - 1.0) < 1e-12


def test_xywh_xyxy_roundtrip():
    rng = np.random.RandomState(1)
    boxes = rng.rand(5, 4) * 100
    back = np.asarray(xyxy_to_xywh(xywh_to_xyxy(boxes, xp=np), xp=np))
    np.testing.assert_allclose(back, boxes, atol=1e-12)


def test_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    dt = rng.rand(6, 4).astype(np.float32) * 80
    gt = rng.rand(4, 4).astype(np.float32) * 80
    got_np = np.asarray(box_iou_matrix(dt, gt, xp=np))
    got_jax = np.asarray(box_iou_matrix(jnp.asarray(dt), jnp.asarray(gt)))
    np.testing.assert_allclose(got_np, got_jax, atol=1e-5)
