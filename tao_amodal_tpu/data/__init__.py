"""Dataset APIs: host-side JSON indices + padded columnar views for XLA.

The host classes (:class:`TaoDataset`, :class:`LvisDataset`, result
wrappers) keep the reference's public API shape so downstream tools are
drop-in compatible; the ``*_columns`` helpers produce the padded dense
tensors the device kernels consume.
"""

from tao_amodal_tpu.data.tao import TaoDataset  # noqa: F401
from tao_amodal_tpu.data.lvis import LvisDataset  # noqa: F401
from tao_amodal_tpu.data.results import (  # noqa: F401
    TaoResultsDataset,
    LvisResultsDataset,
    make_track_ids_unique,
)

# Reference-compatible aliases (reference exposes Tao/TaoResults/LVIS/
# LVISResults; ``tao_amodal/evaluation/tao_amodal/__init__.py``).
Tao = TaoDataset
TaoResults = TaoResultsDataset
LVIS = LvisDataset
LVISResults = LvisResultsDataset
