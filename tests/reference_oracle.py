"""Import the reference evaluators as a parity oracle.

The reference (read-only at /root/reference) depends on numba,
pycocotools, and the removed ``np.float`` alias; none are available, so
we shim them before import:

  * ``numba.jit`` -> identity decorator (the decorated kernel is pure
    Python/numpy);
  * ``pycocotools.mask`` -> thin module exposing ``iou`` backed by our
    independently unit-tested box-IoU (the oracle fixtures are
    bbox-type, so only box IoU is exercised);
  * ``np.float`` -> float.

This makes the oracle's *algorithm* the reference's own code, with only
leaf numeric kernels swapped for verified equivalents.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _install_shims():
    np.float = float  # removed in numpy>=1.24; reference uses it

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def jit(func=None, **kwargs):
            if func is None:
                return lambda f: f
            return func

        numba.jit = jit
        sys.modules["numba"] = numba

    if "pycocotools" not in sys.modules:
        from tao_amodal_tpu.ops import mask as mask_ops

        pycocotools = types.ModuleType("pycocotools")
        mask_mod = types.ModuleType("pycocotools.mask")
        mask_mod.iou = mask_ops.iou
        mask_mod.area = mask_ops.area
        mask_mod.toBbox = mask_ops.to_bbox
        mask_mod.decode = mask_ops.decode
        mask_mod.encode = mask_ops.encode
        mask_mod.merge = mask_ops.merge
        mask_mod.frPyObjects = mask_ops.fr_py_objects
        pycocotools.mask = mask_mod
        sys.modules["pycocotools"] = pycocotools
        sys.modules["pycocotools.mask"] = mask_mod


def load_reference():
    """Returns (ref_tao_module, ref_lvis_module) from /root/reference."""
    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import tao_amodal.evaluation.tao_amodal as ref_tao
    import tao_amodal.evaluation.lvis_amodal.eval as _  # noqa: F401
    # Import the subpackage pieces directly to dodge lvis_amodal/__init__
    # pulling in matplotlib-heavy vis.
    import tao_amodal.evaluation.lvis_amodal.lvis as ref_lvis_mod
    import tao_amodal.evaluation.lvis_amodal.results as ref_lvis_results
    import tao_amodal.evaluation.lvis_amodal.eval as ref_lvis_eval

    lvis_ns = types.SimpleNamespace(
        LVIS=ref_lvis_mod.LVIS,
        LVISResults=ref_lvis_results.LVISResults,
        LVISEval=ref_lvis_eval.LVISEval,
    )
    return ref_tao, lvis_ns
