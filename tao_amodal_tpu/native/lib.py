"""Build + ctypes binding for the native C++ host library.

Compiles ``rle.cc`` and ``region.cc`` into ``libtao_native.so`` on first
use (cached; rebuilt when sources are newer).  Python<->C marshalling is
plain numpy buffers via ctypes — no pybind11 dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["rle.cc", "region.cc"]
_SO_PATH = os.path.join(_HERE, "libtao_native.so")
_lock = threading.Lock()
_cached = None


def build(force=False):
    """Compile the shared library if missing or stale."""
    srcs = [os.path.join(_HERE, s) for s in _SOURCES]
    if not force and os.path.exists(_SO_PATH):
        so_mtime = os.path.getmtime(_SO_PATH)
        if all(os.path.getmtime(s) < so_mtime for s in srcs):
            return _SO_PATH
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO_PATH] + srcs
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


class NativeLib:
    """Typed wrapper over the shared library."""

    MAX_COUNTS = 1 << 22

    def __init__(self, so_path):
        lib = ctypes.CDLL(so_path)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f64p = ctypes.POINTER(ctypes.c_double)
        i64p = ctypes.POINTER(ctypes.c_int64)

        lib.rle_encode.restype = ctypes.c_int
        lib.rle_encode.argtypes = [u8p, ctypes.c_int64, u32p, ctypes.c_int]
        lib.rle_decode.restype = None
        lib.rle_decode.argtypes = [u32p, ctypes.c_int, u8p, ctypes.c_int64]
        lib.rle_area.restype = ctypes.c_double
        lib.rle_area.argtypes = [u32p, ctypes.c_int]
        lib.rle_merge_pair.restype = ctypes.c_int
        lib.rle_merge_pair.argtypes = [u32p, ctypes.c_int, u32p,
                                       ctypes.c_int, ctypes.c_int, u32p,
                                       ctypes.c_int]
        lib.rle_iou_pair.restype = ctypes.c_double
        lib.rle_iou_pair.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int,
                                     ctypes.c_int]
        lib.rle_iou_matrix.restype = None
        lib.rle_iou_matrix.argtypes = [u32p, i64p, ctypes.c_int, u32p, i64p,
                                       ctypes.c_int, u8p, f64p]
        lib.rle_to_bbox.restype = None
        lib.rle_to_bbox.argtypes = [u32p, ctypes.c_int, ctypes.c_int, f64p]
        lib.rle_from_poly.restype = ctypes.c_int
        lib.rle_from_poly.argtypes = [f64p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, u32p, ctypes.c_int]
        lib.bbox_iou_matrix.restype = None
        lib.bbox_iou_matrix.argtypes = [f64p, ctypes.c_int, f64p,
                                        ctypes.c_int, u8p, f64p]
        lib.bbox_nms.restype = None
        lib.bbox_nms.argtypes = [f64p, ctypes.c_int, ctypes.c_double, u8p]
        lib.region_polygon_overlap.restype = ctypes.c_double
        lib.region_polygon_overlap.argtypes = [f64p, ctypes.c_int, f64p,
                                               ctypes.c_int, ctypes.c_int,
                                               ctypes.c_int]
        self._lib = lib

    # -- helpers -------------------------------------------------------

    @staticmethod
    def _u32(a):
        return np.ascontiguousarray(a, dtype=np.uint32)

    @staticmethod
    def _ptr(a, ctype):
        return a.ctypes.data_as(ctypes.POINTER(ctype))

    # -- RLE API (counts = uint32 numpy arrays) ------------------------

    def encode_counts(self, mask):
        """Column-major uint8 mask -> counts array."""
        flat = np.asfortranarray(mask, dtype=np.uint8).reshape(-1, order="F")
        out = np.empty(min(flat.size + 2, self.MAX_COUNTS), np.uint32)
        m = self._lib.rle_encode(self._ptr(flat, ctypes.c_uint8), flat.size,
                                 self._ptr(out, ctypes.c_uint32), out.size)
        if m < 0:
            raise RuntimeError("rle_encode overflow")
        return out[:m].copy()

    def decode_counts(self, counts, h, w):
        counts = self._u32(counts)
        out = np.zeros(h * w, np.uint8)
        self._lib.rle_decode(self._ptr(counts, ctypes.c_uint32),
                             len(counts), self._ptr(out, ctypes.c_uint8),
                             out.size)
        return out.reshape((h, w), order="F")

    def area(self, counts):
        counts = self._u32(counts)
        return self._lib.rle_area(self._ptr(counts, ctypes.c_uint32),
                                  len(counts))

    def merge_pair(self, a, b, intersect=False):
        a, b = self._u32(a), self._u32(b)
        out = np.empty(len(a) + len(b) + 2, np.uint32)
        m = self._lib.rle_merge_pair(
            self._ptr(a, ctypes.c_uint32), len(a),
            self._ptr(b, ctypes.c_uint32), len(b), int(intersect),
            self._ptr(out, ctypes.c_uint32), out.size)
        if m < 0:
            raise RuntimeError("rle_merge overflow")
        return out[:m].copy()

    def iou_pair(self, a, b, iscrowd=False):
        a, b = self._u32(a), self._u32(b)
        return self._lib.rle_iou_pair(
            self._ptr(a, ctypes.c_uint32), len(a),
            self._ptr(b, ctypes.c_uint32), len(b), int(iscrowd))

    def iou_matrix(self, dt_counts_list, gt_counts_list, iscrowd=None):
        """Pairwise RLE IoU over lists of counts arrays."""
        def pack(lst):
            off = np.zeros(len(lst) + 1, np.int64)
            for i, c in enumerate(lst):
                off[i + 1] = off[i] + len(c)
            packed = (np.concatenate([self._u32(c) for c in lst])
                      if lst else np.zeros(0, np.uint32))
            return np.ascontiguousarray(packed), off

        d, doff = pack(dt_counts_list)
        g, goff = pack(gt_counts_list)
        crowd = np.zeros(len(gt_counts_list), np.uint8)
        if iscrowd is not None:
            crowd[:] = np.asarray(iscrowd, np.uint8)
        out = np.zeros((len(dt_counts_list), len(gt_counts_list)),
                       np.float64)
        if out.size:
            self._lib.rle_iou_matrix(
                self._ptr(d, ctypes.c_uint32),
                self._ptr(doff, ctypes.c_int64), len(dt_counts_list),
                self._ptr(g, ctypes.c_uint32),
                self._ptr(goff, ctypes.c_int64), len(gt_counts_list),
                self._ptr(crowd, ctypes.c_uint8),
                self._ptr(out, ctypes.c_double))
        return out

    def to_bbox(self, counts, h):
        counts = self._u32(counts)
        out = np.zeros(4, np.float64)
        self._lib.rle_to_bbox(self._ptr(counts, ctypes.c_uint32),
                              len(counts), h,
                              self._ptr(out, ctypes.c_double))
        return out

    def fr_poly(self, xy, h, w):
        """Polygon coords [x0,y0,...] -> RLE dict (compressed counts)."""
        from tao_amodal_tpu.ops.mask import _compress_counts

        xy = np.ascontiguousarray(xy, np.float64)
        out = np.empty(self.MAX_COUNTS, np.uint32)
        m = self._lib.rle_from_poly(
            self._ptr(xy, ctypes.c_double), len(xy) // 2, h, w,
            self._ptr(out, ctypes.c_uint32), out.size)
        if m < 0:
            raise RuntimeError("rle_from_poly overflow")
        return {"size": [h, w],
                "counts": _compress_counts(out[:m].tolist())}

    # -- boxes / regions ----------------------------------------------

    def bbox_iou(self, dt, gt, iscrowd=None):
        dt = np.ascontiguousarray(dt, np.float64).reshape(-1, 4)
        gt = np.ascontiguousarray(gt, np.float64).reshape(-1, 4)
        crowd = np.zeros(len(gt), np.uint8)
        if iscrowd is not None:
            crowd[:] = np.asarray(iscrowd, np.uint8)
        out = np.zeros((len(dt), len(gt)), np.float64)
        if out.size:
            self._lib.bbox_iou_matrix(
                self._ptr(dt, ctypes.c_double), len(dt),
                self._ptr(gt, ctypes.c_double), len(gt),
                self._ptr(crowd, ctypes.c_uint8),
                self._ptr(out, ctypes.c_double))
        return out

    def bbox_nms(self, boxes, thr):
        boxes = np.ascontiguousarray(boxes, np.float64).reshape(-1, 4)
        keep = np.zeros(len(boxes), np.uint8)
        self._lib.bbox_nms(self._ptr(boxes, ctypes.c_double), len(boxes),
                           float(thr), self._ptr(keep, ctypes.c_uint8))
        return keep.astype(bool)

    def polygon_overlap(self, p1, p2, bounds=None):
        """VOT-style polygon overlap; bounds=(w, h) optionally clips."""
        p1 = np.ascontiguousarray(p1, np.float64).reshape(-1)
        p2 = np.ascontiguousarray(p2, np.float64).reshape(-1)
        bw, bh = bounds if bounds is not None else (0, 0)
        return self._lib.region_polygon_overlap(
            self._ptr(p1, ctypes.c_double), len(p1) // 2,
            self._ptr(p2, ctypes.c_double), len(p2) // 2, int(bw), int(bh))


def load():
    """Build if needed and return the singleton NativeLib."""
    global _cached
    with _lock:
        if _cached is None:
            _cached = NativeLib(build())
        return _cached
