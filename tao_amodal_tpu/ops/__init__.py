"""Numeric kernels: batched, statically-shaped, jit/vmap-friendly."""

from tao_amodal_tpu.ops.boxes import (  # noqa: F401
    box_area,
    box_intersect_union,
    box_iou_matrix,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from tao_amodal_tpu.ops.track_iou import track_iou_matrix  # noqa: F401
from tao_amodal_tpu.ops.matching import greedy_match, greedy_match_jax  # noqa: F401
from tao_amodal_tpu.ops.pr import pr_curves  # noqa: F401
