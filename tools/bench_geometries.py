#!/usr/bin/env python
"""Capture the flagship bench at BOTH deployment geometries.

Runs ``bench.py`` at the production 4:3 (640x480 -> 512x384) and the
16:9 BDD/ArgoVerse geometry (1280x720 -> 512x288) and writes one JSON
(``experiments/bench_geometries_r{N}.json``) so geometry regressions
are visible round over round without archaeology through BENCH_NOTES
prose (VERDICT r4 item 8).

Each geometry runs in a fresh subprocess: the two programs share
nothing, and a crash in one still records the other.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEOMETRIES = {
    "4:3 (640x480 -> 512x384, production default)": [],
    "16:9 (1280x720 -> 512x288, BDD/ArgoVerse)": ["--wide"],
}


def run_one(extra_args):
    cmd = [sys.executable, os.path.join(REPO, "bench.py")] + extra_args
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=1200)
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {"error": (proc.stderr or proc.stdout).strip()[-500:],
            "rc": proc.returncode}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out",
                   default="experiments/bench_geometries.json")
    args = p.parse_args(argv)
    results = {}
    for name, extra in GEOMETRIES.items():
        results[name] = run_one(extra)
        print(f"{name}: {json.dumps(results[name])}")
        with open(args.out, "w") as f:  # incremental: crash-safe
            json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
