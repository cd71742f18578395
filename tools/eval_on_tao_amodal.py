#!/usr/bin/env python
"""Evaluate TAO-Amodal tracking predictions (detection AP + Track-mAP).

CLI-compatible with the reference tools/eval_on_tao_amodal.py:

    python tools/eval_on_tao_amodal.py \
        --track_result lvis_instances_results.json \
        --output_log eval.log \
        --annotation validation_lvis_v1.json
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from tao_amodal_tpu.cli.eval_cli import main  # noqa: E402

if __name__ == "__main__":
    main()
