import numpy as np

from tao_amodal_tpu.ops import mask as mask_ops


def _random_mask(rng, h, w):
    return (rng.rand(h, w) < 0.3).astype(np.uint8)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    for h, w in [(1, 1), (7, 5), (32, 17), (64, 64)]:
        m = _random_mask(rng, h, w)
        rle = mask_ops.encode(m)
        assert isinstance(rle["counts"], bytes)
        back = mask_ops.decode(rle)
        np.testing.assert_array_equal(back, m)


def test_compress_roundtrip():
    rng = np.random.RandomState(1)
    counts = rng.randint(0, 10_000, size=31).tolist()
    s = mask_ops._compress_counts(counts)
    back = mask_ops._decompress_counts(s)
    assert back == counts


def test_area_and_bbox():
    m = np.zeros((20, 30), np.uint8)
    m[3:9, 5:12] = 1
    rle = mask_ops.encode(m)
    assert mask_ops.area(rle) == 6 * 7
    np.testing.assert_array_equal(mask_ops.to_bbox(rle), [5, 3, 7, 6])


def test_merge_union_intersect():
    rng = np.random.RandomState(2)
    a = _random_mask(rng, 16, 16)
    b = _random_mask(rng, 16, 16)
    ra, rb = mask_ops.encode(a), mask_ops.encode(b)
    uni = mask_ops.decode(mask_ops.merge([ra, rb]))
    inter = mask_ops.decode(mask_ops.merge([ra, rb], intersect=True))
    np.testing.assert_array_equal(uni, (a | b))
    np.testing.assert_array_equal(inter, (a & b))


def test_rle_iou_vs_dense():
    rng = np.random.RandomState(3)
    dts = [mask_ops.encode(_random_mask(rng, 24, 24)) for _ in range(3)]
    gts = [mask_ops.encode(_random_mask(rng, 24, 24)) for _ in range(2)]
    got = mask_ops.iou(dts, gts, [0, 0])
    for i in range(3):
        for j in range(2):
            dm = mask_ops.decode(dts[i]).astype(bool)
            gm = mask_ops.decode(gts[j]).astype(bool)
            inter = (dm & gm).sum()
            union = (dm | gm).sum()
            exp = inter / union if union else 0.0
            assert abs(got[i, j] - exp) < 1e-12


def test_box_iou_dispatch():
    dt = [[0.0, 0, 10, 10]]
    gt = [[0.0, 0, 10, 10], [5.0, 5, 10, 10]]
    got = mask_ops.iou(np.array(dt), np.array(gt), [0, 0])
    assert abs(got[0, 0] - 1.0) < 1e-12
    assert abs(got[0, 1] - 25 / 175) < 1e-12


def test_poly_rect_rasterization():
    # Axis-aligned integer rectangle polygon: pixels [2..6] x [3..9]
    # (pycocotools convention covers x in [2,7), y in [3,10)).
    poly = [2, 3, 2, 10, 7, 10, 7, 3]
    rle = mask_ops.from_poly([poly], 16, 12)[0]
    m = mask_ops.decode(rle)
    exp = np.zeros((16, 12), np.uint8)
    exp[3:10, 2:7] = 1
    np.testing.assert_array_equal(m, exp)


def test_poly_triangle_close_to_cv2():
    import cv2

    h, w = 64, 64
    tri = [8.0, 8.0, 56.0, 12.0, 30.0, 60.0]
    rle = mask_ops.from_poly([tri], h, w)[0]
    ours = mask_ops.decode(rle)
    ref = np.zeros((h, w), np.uint8)
    pts = np.array(tri, np.float64).reshape(-1, 2)
    cv2.fillPoly(ref, [np.round(pts).astype(np.int32)], 1)
    # Different sub-pixel conventions: allow a thin boundary band.
    diff = np.abs(ours.astype(int) - ref.astype(int)).sum()
    assert diff < 0.15 * ref.sum(), (diff, ref.sum())


def test_mask_iou_dense_matches_host():
    rng = np.random.RandomState(4)
    d = (rng.rand(3, 16, 16) < 0.4).astype(np.float32)
    g = (rng.rand(2, 16, 16) < 0.4).astype(np.float32)
    got = np.asarray(mask_ops.mask_iou_dense(d, g))
    for i in range(3):
        for j in range(2):
            inter = (d[i].astype(bool) & g[j].astype(bool)).sum()
            union = (d[i].astype(bool) | g[j].astype(bool)).sum()
            exp = inter / union if union else 0.0
            assert abs(got[i, j] - exp) < 1e-5
