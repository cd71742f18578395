#!/usr/bin/env python
"""Run/evaluate an SOT tracker over a benchmark (reference
pysot tools/test.py + pytracking run_tracker.py CLI surface)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from tao_amodal_tpu.cli.sot_cli import main  # noqa: E402

if __name__ == "__main__":
    main()
