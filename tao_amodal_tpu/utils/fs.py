"""Filesystem + misc helpers.

Capability-parity with reference ``visualization/tao/utils/{fs,misc}.py``:
extension-filtered globbing, bool parsing, simple tables, detection
matrix loaders.
"""

from __future__ import annotations

import glob as _glob
import os

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")
VID_EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv")


def glob_ext(path, extensions, recursive=False):
    """All files under ``path`` with one of ``extensions``."""
    pattern = os.path.join(path, "**" if recursive else "*")
    files = _glob.glob(pattern, recursive=recursive)
    return sorted(f for f in files
                  if os.path.splitext(f)[1].lower() in extensions)


def parse_bool(value):
    if isinstance(value, bool):
        return value
    return str(value).lower() in ("yes", "true", "t", "1")


def simple_table(rows):
    """Aligned two-column table (reference ``fs.py:simple_table``)."""
    if not rows:
        return ""
    width = max(len(str(r[0])) for r in rows)
    return "\n".join(f"{str(k):<{width}}  {v}" for k, v in rows)


def load_detection_mat(path):
    """MOT-style detection file: ``frame, id, x, y, w, h, score, ...``
    (capability of reference ``misc.py`` detection loaders)."""
    import numpy as np

    data = np.loadtxt(path, delimiter=",", ndmin=2)
    return data


def dump_detection_mat(path, dets):
    import numpy as np

    np.savetxt(path, np.asarray(dets), delimiter=",", fmt="%.2f")
