#!/usr/bin/env python
"""Render dataset annotation videos with BURST masks (reference
vis_amodal_mask_videos.py CLI surface)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from tao_amodal_tpu.cli.vis_cli import main  # noqa: E402

if __name__ == "__main__":
    main(mode="annotations")
