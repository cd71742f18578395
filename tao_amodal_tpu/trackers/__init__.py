"""Trackers: multi-object association (SORT) and single-object
(Siamese RPN, online-discriminative) trackers."""

from tao_amodal_tpu.trackers.sort import Sort, SortState  # noqa: F401
from tao_amodal_tpu.trackers.base import Tracker  # noqa: F401
