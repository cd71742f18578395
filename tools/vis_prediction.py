#!/usr/bin/env python
"""Render prediction videos (reference vis_prediction.py CLI surface)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from tao_amodal_tpu.cli.vis_cli import main  # noqa: E402

if __name__ == "__main__":
    main(mode="prediction")
