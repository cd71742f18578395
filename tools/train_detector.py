#!/usr/bin/env python
"""Train the detector + Amodal Expander (companion-repo capability).
Use --smoke for a synthetic end-to-end run."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from tao_amodal_tpu.cli.train_detector_cli import main  # noqa: E402

if __name__ == "__main__":
    main()
