#!/usr/bin/env python
"""Evaluate written SOT trajectories (reference pysot tools/eval.py
CLI surface): pass --eval_only plus the same dataset flags."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from tao_amodal_tpu.cli.sot_cli import main  # noqa: E402

if __name__ == "__main__":
    main(["--eval_only"] + sys.argv[1:])
