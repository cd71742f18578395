"""Native C++ codec vs the numpy fallback implementations."""

import numpy as np
import pytest

from tao_amodal_tpu.ops import mask as mask_ops

native = pytest.importorskip("tao_amodal_tpu.native.lib")


@pytest.fixture(scope="module")
def lib():
    return native.load()


def _rand_mask(rng, h, w, p=0.35):
    return (rng.rand(h, w) < p).astype(np.uint8)


def test_encode_decode_roundtrip(lib):
    rng = np.random.RandomState(0)
    for h, w in [(1, 1), (13, 7), (64, 48), (128, 128)]:
        m = _rand_mask(rng, h, w)
        counts = lib.encode_counts(m)
        np.testing.assert_array_equal(lib.decode_counts(counts, h, w), m)
        # Cross-check against the numpy codec.
        np_counts = mask_ops._counts_list(mask_ops.encode(m))
        assert counts.tolist() == np_counts


def test_area_merge_iou(lib):
    rng = np.random.RandomState(1)
    a = _rand_mask(rng, 40, 30)
    b = _rand_mask(rng, 40, 30)
    ca, cb = lib.encode_counts(a), lib.encode_counts(b)
    assert lib.area(ca) == a.sum()
    uni = lib.decode_counts(lib.merge_pair(ca, cb), 40, 30)
    np.testing.assert_array_equal(uni, a | b)
    inter = lib.decode_counts(lib.merge_pair(ca, cb, intersect=True), 40, 30)
    np.testing.assert_array_equal(inter, a & b)

    i = (a & b).sum()
    u = (a | b).sum()
    assert abs(lib.iou_pair(ca, cb) - i / u) < 1e-12
    assert abs(lib.iou_pair(ca, cb, iscrowd=True) - i / a.sum()) < 1e-12


def test_iou_matrix(lib):
    rng = np.random.RandomState(2)
    dts = [_rand_mask(rng, 24, 24) for _ in range(4)]
    gts = [_rand_mask(rng, 24, 24) for _ in range(3)]
    dc = [lib.encode_counts(m) for m in dts]
    gc = [lib.encode_counts(m) for m in gts]
    got = lib.iou_matrix(dc, gc)
    for i in range(4):
        for j in range(3):
            inter = (dts[i] & gts[j]).sum()
            union = (dts[i] | gts[j]).sum()
            exp = inter / union if union else 0
            assert abs(got[i, j] - exp) < 1e-12


def test_to_bbox(lib):
    m = np.zeros((20, 30), np.uint8)
    m[3:9, 5:12] = 1
    np.testing.assert_array_equal(lib.to_bbox(lib.encode_counts(m), 20),
                                  [5, 3, 7, 6])


def test_fr_poly_matches_numpy(lib):
    polys = [
        [2, 3, 2, 10, 7, 10, 7, 3],
        [8.0, 8.0, 56.0, 12.0, 30.0, 60.0],
        [5.5, 5.5, 20.5, 8.2, 30.1, 25.7, 10.0, 30.0],
    ]
    for poly in polys:
        c_rle = lib.fr_poly(np.array(poly, float), 64, 64)
        np_rle = mask_ops._fr_poly_numpy(np.array(poly, float), 64, 64)
        assert c_rle["counts"] == np_rle["counts"], poly


def test_bbox_iou_matches_ops(lib):
    rng = np.random.RandomState(3)
    dt = np.abs(rng.randn(9, 4)) * 40
    gt = np.abs(rng.randn(5, 4)) * 40
    from tao_amodal_tpu.ops.boxes import box_iou_matrix
    np.testing.assert_allclose(lib.bbox_iou(dt, gt),
                               np.asarray(box_iou_matrix(dt, gt, xp=np)),
                               atol=1e-12)


def test_bbox_nms(lib):
    boxes = np.array([
        [0, 0, 10, 10],    # highest score
        [1, 1, 10, 10],    # big overlap -> suppressed
        [50, 50, 10, 10],  # far -> kept
    ], float)
    keep = lib.bbox_nms(boxes, 0.5)
    assert keep.tolist() == [True, False, True]


def test_polygon_overlap(lib):
    sq1 = [0, 0, 10, 0, 10, 10, 0, 10]
    sq2 = [5, 0, 15, 0, 15, 10, 5, 10]
    ov = lib.polygon_overlap(sq1, sq2)
    assert 0.25 < ov < 0.42  # exact 1/3 modulo rasterization convention
    assert lib.polygon_overlap(sq1, sq1) == 1.0
    far = [100, 100, 110, 100, 110, 110, 100, 110]
    assert lib.polygon_overlap(sq1, far) == 0.0
