"""Evaluation engines: Track-mAP (3D IoU) and amodal detection AP.

Metric-parity rebuilds of the reference evaluators
(``tao_amodal/evaluation/tao_amodal/eval.py`` and
``tao_amodal/evaluation/lvis_amodal/eval.py``) on top of batched array
kernels (:mod:`tao_amodal_tpu.ops`).
"""

from tao_amodal_tpu.evaluation.params import (  # noqa: F401
    TrackEvalParams,
    DetectionEvalParams,
)
from tao_amodal_tpu.evaluation.track_eval import TrackMapEvaluator  # noqa: F401
from tao_amodal_tpu.evaluation.detection_eval import (  # noqa: F401
    AmodalDetectionEvaluator,
)


def __getattr__(name):  # lazy: avoids importing jax for host-only use
    if name == "DeviceTrackEval":
        from tao_amodal_tpu.evaluation.device_eval import DeviceTrackEval

        return DeviceTrackEval
    raise AttributeError(name)


# Reference-compatible aliases.
TaoEval = TrackMapEvaluator
LVISEval = AmodalDetectionEvaluator
