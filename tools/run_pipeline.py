#!/usr/bin/env python
"""Run the flagship detect+expand+track pipeline over a dataset and
write the evaluator-ready prediction JSON."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from tao_amodal_tpu.cli.infer_cli import main  # noqa: E402

if __name__ == "__main__":
    main()
