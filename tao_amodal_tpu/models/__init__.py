"""Model zoo: flax.linen modules, NHWC layout, bfloat16-friendly.

Capability-parity with the reference's model families:
  * Siamese RPN trackers (SiamRPN/SiamRPN++/SiamMask) — reference
    ``pysot/models/``;
  * online-optimized discriminative trackers (DiMP/ATOM-style) —
    reference ``pytracking/ltr/models/``;
  * GTR-style detector (ResNet+FPN+RPN+RoI heads) feeding the Amodal
    Expander — the inference stack the prediction JSONs come from;
  * Amodal Expander box-regression head.
"""

from tao_amodal_tpu.models.backbones import (  # noqa: F401
    AlexNet,
    MobileNetV2,
    ResNet,
    resnet50,
)
from tao_amodal_tpu.models.siamese import SiameseTracker  # noqa: F401
from tao_amodal_tpu.models.detector import ClipDetector  # noqa: F401
from tao_amodal_tpu.models.amodal_expander import AmodalExpander  # noqa: F401
