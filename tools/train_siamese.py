#!/usr/bin/env python
"""Train the Siamese RPN tracker (reference pysot tools/train.py CLI
surface). Use --smoke for a synthetic-data sanity run."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from tao_amodal_tpu.cli.train_cli import main  # noqa: E402

if __name__ == "__main__":
    main()
