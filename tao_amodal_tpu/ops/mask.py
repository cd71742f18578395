"""COCO-style RLE mask codec (pycocotools-compatible API).

Rebuilds the capability of the reference's vendored C mask kernel
(``visualization/tao/third_party/pysot/training_dataset/coco/pycocotools/
common/maskApi.c``) without copying it: run-length masks are column-major
(Fortran order) alternating runs starting with a zero-run, compressed to
the same LEB128-style string format pycocotools uses, so RLE strings are
interchangeable with reference-produced annotation files (BURST masks,
LVIS segmentations).

Two backends:
  * the C++ library in ``tao_amodal_tpu/native`` (via ctypes), used when
    built — run-level merge/IoU without decoding;
  * a pure-numpy fallback (this module) that is vectorized run math, not
    per-pixel Python.

Device-side mask IoU for eval parity decodes to dense bitmasks and uses a
single einsum on TPU (see :func:`mask_iou_dense`).
"""

from __future__ import annotations

import numpy as np

_native = None


def _get_native():
    """Lazily load the C++ codec; fall back to numpy silently."""
    global _native
    if _native is None:
        try:
            from tao_amodal_tpu.native import lib as native_lib
            _native = native_lib.load()
        except Exception:  # pragma: no cover - fallback path
            _native = False
    return _native or None


# ----------------------------------------------------------------------
# Core run-length representation: dict {"size": [h, w], "counts": ...}
# counts either a list of ints (uncompressed) or a bytes/str (compressed).
# ----------------------------------------------------------------------

def encode(mask):
    """Binary mask ``[h, w]`` (or ``[h, w, n]``) -> compressed RLE dict(s).

    Column-major runs, first run counts zeros.
    """
    if mask.ndim == 3:
        return [encode(mask[:, :, i]) for i in range(mask.shape[2])]
    h, w = mask.shape
    flat = np.asfortranarray(mask).reshape(-1, order="F").astype(np.uint8)
    # Run boundaries via diff on the flattened column-major mask.
    if flat.size == 0:
        counts = []
    else:
        change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
        bounds = np.concatenate([[0], change, [flat.size]])
        runs = np.diff(bounds)
        counts = runs.tolist()
        if flat[0] == 1:
            counts = [0] + counts
    return {"size": [h, w], "counts": _compress_counts(counts)}


def decode(rle):
    """RLE dict (compressed or uncompressed) -> uint8 mask ``[h, w]``.

    Lists of RLEs decode to ``[h, w, n]``.
    """
    if isinstance(rle, (list, tuple)):
        masks = [decode(r) for r in rle]
        return np.stack(masks, axis=2) if masks else np.zeros((0, 0, 0), np.uint8)
    h, w = rle["size"]
    counts = _counts_list(rle)
    flat = np.zeros(h * w, dtype=np.uint8)
    if counts:
        bounds = np.concatenate([[0], np.cumsum(counts)])
        # Runs alternate starting with zeros: 1-run i is
        # [bounds[2i+1], bounds[2i+2]).
        ends = np.append(bounds[2::2], h * w)
        for s, e in zip(bounds[1::2], ends):
            flat[s:e] = 1
    return flat.reshape((h, w), order="F")


def area(rle):
    """Foreground pixel count; works on a dict or list of dicts."""
    if isinstance(rle, (list, tuple)):
        return np.array([area(r) for r in rle], dtype=np.uint64)
    counts = _counts_list(rle)
    return int(sum(counts[1::2]))


def to_bbox(rle):
    """RLE -> xywh bbox (float), matching pycocotools ``toBbox``."""
    if isinstance(rle, (list, tuple)):
        return np.stack([to_bbox(r) for r in rle]).astype(np.float64)
    h, w = rle["size"]
    counts = np.asarray(_counts_list(rle), dtype=np.int64)
    if counts.sum() == 0 or len(counts) < 2 or counts[1::2].sum() == 0:
        return np.zeros(4, dtype=np.float64)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    starts = bounds[1::2][: len(counts[1::2])]       # start index of 1-runs
    ends = starts + counts[1::2]                      # end (exclusive)
    cols_s, rows_s = np.divmod(starts, h)
    cols_e, rows_e = np.divmod(ends - 1, h)
    # A 1-run can span multiple columns; if so it covers full rows.
    spans = cols_e > cols_s
    ymin = rows_s.min() if not spans.any() else 0
    ymax = rows_e.max() if not spans.any() else h - 1
    if spans.any():
        ymin, ymax = 0, h - 1
    else:
        ymin, ymax = int(rows_s.min()), int(rows_e.max())
    xmin, xmax = int(cols_s.min()), int(cols_e.max())
    return np.array([xmin, ymin, xmax - xmin + 1, ymax - ymin + 1],
                    dtype=np.float64)


def from_bbox(boxes, h, w):
    """xywh boxes ``[n, 4]`` -> list of RLEs (rasterized rectangles)."""
    boxes = np.atleast_2d(np.asarray(boxes, dtype=np.float64))
    out = []
    for x, y, bw, bh in boxes:
        poly = [x, y, x, y + bh, x + bw, y + bh, x + bw, y]
        out.append(from_poly([poly], h, w)[0])
    return out


def merge(rles, intersect=False):
    """Union (or intersection) of RLEs -> one RLE."""
    if not isinstance(rles, (list, tuple)):
        return rles
    if len(rles) == 1:
        return dict(rles[0])
    native = _get_native()
    if native is not None:
        acc = np.asarray(_counts_list(rles[0]), np.uint32)
        for r in rles[1:]:
            acc = native.merge_pair(
                acc, np.asarray(_counts_list(r), np.uint32),
                intersect=intersect)
        return {"size": list(rles[0]["size"]),
                "counts": _compress_counts(acc.tolist())}
    masks = decode(list(rles))
    if intersect:
        combined = np.all(masks, axis=2)
    else:
        combined = np.any(masks, axis=2)
    return encode(combined.astype(np.uint8))


def intersect_area(a, b):
    """Exact ``|A ∩ B|`` (pixel count) of two same-size RLEs."""
    native = _get_native()
    if native is not None:
        acc = native.merge_pair(
            np.asarray(_counts_list(a), np.uint32),
            np.asarray(_counts_list(b), np.uint32), intersect=True)
        return int(np.asarray(acc)[1::2].sum())
    return int(np.logical_and(decode(a), decode(b)).sum())


def iou(dt, gt, iscrowd):
    """Pairwise IoU of detections vs gts; boxes or RLEs.

    pycocotools-``mask.iou``-compatible: inputs may be ``[n, 4]`` xywh
    arrays (box IoU) or lists of RLE dicts (mask IoU);
    ``iscrowd[g]`` switches the denominator to the dt area.
    """
    if _is_box_input(dt) and _is_box_input(gt):
        from tao_amodal_tpu.ops.boxes import box_iou_matrix
        d = np.asarray(dt, dtype=np.float64).reshape(-1, 4)
        g = np.asarray(gt, dtype=np.float64).reshape(-1, 4)
        if d.size == 0 or g.size == 0:
            return []
        return np.asarray(box_iou_matrix(d, g, iscrowd=np.asarray(
            iscrowd, dtype=bool) if len(iscrowd) else None, xp=np))
    # RLE mask IoU: run-level sweep in C++ when built; numpy fallback
    # decodes to dense bitmasks.
    dts = dt if isinstance(dt, (list, tuple)) else [dt]
    gts = gt if isinstance(gt, (list, tuple)) else [gt]
    if not dts or not gts:
        return []
    native = _get_native()
    if native is not None:
        return native.iou_matrix(
            [np.asarray(_counts_list(r), np.uint32) for r in dts],
            [np.asarray(_counts_list(r), np.uint32) for r in gts],
            iscrowd=iscrowd if iscrowd is not None and len(iscrowd)
            else None)
    out = np.zeros((len(dts), len(gts)), dtype=np.float64)
    d_masks = [decode(r).astype(bool) for r in dts]
    g_masks = [decode(r).astype(bool) for r in gts]
    d_areas = [m.sum() for m in d_masks]
    g_areas = [m.sum() for m in g_masks]
    for i, dm in enumerate(d_masks):
        for j, gm in enumerate(g_masks):
            inter = np.logical_and(dm, gm).sum()
            if iscrowd is not None and len(iscrowd) > j and iscrowd[j]:
                denom = d_areas[i]
            else:
                denom = d_areas[i] + g_areas[j] - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


def mask_iou_dense(dt_masks, gt_masks, iscrowd=None):
    """Batched mask IoU on device: one einsum over flattened bitmasks.

    Args:
      dt_masks: ``[D, H, W]`` float/bool.
      gt_masks: ``[G, H, W]``.

    Returns ``[D, G]`` IoU — the TPU path for segm-type eval (the MXU eats
    the ``[D, HW] x [HW, G]`` contraction).
    """
    import jax.numpy as jnp
    d = jnp.asarray(dt_masks, jnp.float32).reshape(dt_masks.shape[0], -1)
    g = jnp.asarray(gt_masks, jnp.float32).reshape(gt_masks.shape[0], -1)
    inter = jnp.dot(d, g.T, preferred_element_type=jnp.float32)
    d_area = jnp.sum(d, axis=1, keepdims=True)
    g_area = jnp.sum(g, axis=1, keepdims=True).T
    union = d_area + g_area - inter
    if iscrowd is not None:
        union = jnp.where(jnp.asarray(iscrowd, bool)[None, :], d_area, union)
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def from_poly(polys, h, w):
    """Polygons ``[[x0, y0, x1, y1, ...], ...]`` -> list of RLEs.

    Uses the same boundary scan-conversion convention as pycocotools
    ``rleFrPoly`` (5x upsampled boundary walk, then column-crossing
    parity), so rasterizations agree with reference-era annotations.
    """
    native = _get_native()
    out = []
    for poly in polys:
        xy = np.asarray(poly, dtype=np.float64)
        if native is not None:
            out.append(native.fr_poly(xy, h, w))
        else:
            out.append(_fr_poly_numpy(xy, h, w))
    return out


def fr_py_objects(pyobj, h, w):
    """pycocotools ``frPyObjects`` equivalent: polygons, uncompressed
    RLE dicts, or boxes -> RLE(s)."""
    if isinstance(pyobj, dict):
        if isinstance(pyobj.get("counts"), list):
            return {"size": pyobj["size"],
                    "counts": _compress_counts(pyobj["counts"])}
        return pyobj
    if isinstance(pyobj, (list, tuple)):
        if len(pyobj) == 0:
            return []
        first = pyobj[0]
        if isinstance(first, dict):
            return [fr_py_objects(o, h, w) for o in pyobj]
        if isinstance(first, (list, tuple, np.ndarray)):
            if len(first) == 4 and not isinstance(first[0], (list, tuple)):
                # Could be boxes [n,4] or a short polygon; pycocotools
                # treats list-of-list numeric input by length: polygons
                # have >= 6 coords.  Follow polygon interpretation first.
                pass
            return from_poly([np.asarray(p, np.float64) for p in pyobj], h, w)
        # Flat list of coordinates: single polygon.
        return from_poly([np.asarray(pyobj, np.float64)], h, w)
    raise TypeError(f"Unsupported object type for frPyObjects: {type(pyobj)}")


# ----------------------------------------------------------------------
# Internals
# ----------------------------------------------------------------------

def _is_box_input(x):
    if isinstance(x, np.ndarray):
        return x.ndim == 2 and x.shape[1] == 4
    if isinstance(x, (list, tuple)) and x:
        el = x[0]
        return (isinstance(el, (list, tuple, np.ndarray)) and len(el) == 4
                and not isinstance(el, dict))
    return isinstance(x, (list, tuple)) and not x


def _counts_list(rle):
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        return _decompress_counts(counts)
    return list(counts)


def _compress_counts(counts):
    """LEB128-style signed varint string, pycocotools-compatible.

    Runs after the first two are delta-coded against the run two back;
    each value is emitted 5 bits at a time, bit 5 = continuation, offset
    by 48 into printable ASCII.
    """
    out = bytearray()
    cnts = list(counts)
    for i, c in enumerate(cnts):
        x = int(c)
        if i > 2:
            x -= int(cnts[i - 2])
        more = True
        while more:
            cbits = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (cbits & 0x10)
                        or x == -1 and (cbits & 0x10))
            if more:
                cbits |= 0x20
            out.append(cbits + 48)
    return bytes(out)


def _decompress_counts(s):
    if isinstance(s, str):
        s = s.encode()
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _fr_poly_numpy(xy, h, w):
    """Scan-convert one polygon to RLE, pycocotools-convention.

    Walks the 5x-upsampled boundary, records column-crossing y values,
    and builds runs from the sorted crossing positions (even-odd rule
    along column-major order).
    """
    scale = 5.0
    k = len(xy) // 2
    # trunc, not floor: pycocotools rleFrPoly converts with a C '(int)'
    # cast (truncation toward zero), which differs from floor for the
    # negative coordinates of out-of-frame amodal polygons.
    x = np.trunc(scale * xy[0::2] + 0.5).astype(np.int64)
    y = np.trunc(scale * xy[1::2] + 0.5).astype(np.int64)
    x = np.append(x, x[0])
    y = np.append(y, y[0])

    # Dense boundary points along each edge (Bresenham-ish param walk).
    us, vs = [], []
    for j in range(k):
        xs, xe, ys, ye = int(x[j]), int(x[j + 1]), int(y[j]), int(y[j + 1])
        dx, dy = abs(xe - xs), abs(ys - ye)
        flip = (dx >= dy and xs > xe) or (dx < dy and ys > ye)
        if flip:
            xs, xe, ys, ye = xe, xs, ye, ys
        if dx >= dy:
            s = (ye - ys) / dx if dx > 0 else 0.0
            d = np.arange(dx + 1)
            t = (dx - d) if flip else d
            us.append(t + xs)
            vs.append(np.trunc(ys + s * t + 0.5).astype(np.int64))
        else:
            s = (xe - xs) / dy if dy > 0 else 0.0
            d = np.arange(dy + 1)
            t = (dy - d) if flip else d
            vs.append(t + ys)
            us.append(np.trunc(xs + s * t + 0.5).astype(np.int64))
    u = np.concatenate(us)
    v = np.concatenate(vs)

    # Downsample: keep points where the column changes; x must land on an
    # integer pixel boundary after the inverse transform.
    xs_out, ys_out = [], []
    for j in range(1, len(u)):
        if u[j] == u[j - 1]:
            continue
        xd = float(min(u[j], u[j - 1]) if u[j] < u[j - 1] else u[j] - 1)
        xd = (xd + 0.5) / scale - 0.5
        if np.floor(xd) != xd or xd < 0 or xd > w - 1:
            continue
        yd = float(min(v[j], v[j - 1]))
        yd = (yd + 0.5) / scale - 0.5
        yd = min(max(yd, 0.0), float(h))
        yd = np.ceil(yd)
        xs_out.append(int(xd))
        ys_out.append(int(yd))

    # Column-major positions of crossings; parity between sorted
    # crossings gives the interior runs.
    a = np.array(sorted(int(px) * h + int(py)
                        for px, py in zip(xs_out, ys_out)), dtype=np.int64)
    a = np.append(a, h * w)
    diffs = np.empty_like(a)
    diffs[0] = a[0]
    diffs[1:] = a[1:] - a[:-1]
    counts = []
    j = 0
    vals = diffs.tolist()
    if vals:
        counts.append(vals[0])
        j = 1
        while j < len(vals):
            if vals[j] > 0:
                counts.append(vals[j])
                j += 1
            else:
                j += 1
                if j < len(vals):
                    counts[-1] += vals[j]
                    j += 1
    return {"size": [h, w], "counts": _compress_counts(counts)}
