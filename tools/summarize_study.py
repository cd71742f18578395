#!/usr/bin/env python
"""Summarize an accuracy-study JSON into a per-question delta table.

For each non-base config, prints the Track-AP50 / Track-AP / det-AP
delta vs the base config at every checkpoint, plus the per-group
Track-AP50 spread (the empirical noise scale: a delta is only real if
it clears the spread and holds its sign across checkpoints — VERDICT
r3 item 2's acceptance standard, applied at the TRACK level).

Usage:
  python tools/summarize_study.py experiments/accuracy_study_r4.json \
      --base res512
"""

from __future__ import annotations

import argparse
import json
import re
import statistics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("study")
    p.add_argument("--base", default="res512",
                   help="tag of the base config")
    p.add_argument("--compare", default=None,
                   help="second study JSON: additionally print, for "
                        "every (ckpt, tag) present in both files, the "
                        "COMPARE-minus-STUDY delta per metric — the "
                        "cross-run ablation view (e.g. PasteNOcclude "
                        "on vs off, which train in separate runs)")
    args = p.parse_args(argv)

    with open(args.study) as f:
        results = json.load(f)

    by_ckpt = {}
    for key, row in results.items():
        m = re.match(r"ckpt(\d+)_(.+)", key)
        if not m:
            continue
        by_ckpt.setdefault(int(m.group(1)), {})[m.group(2)] = row

    ckpts = sorted(by_ckpt)
    tags = sorted({t for c in by_ckpt.values() for t in c},
                  key=lambda t: (t != args.base, t))
    if not ckpts or args.base not in by_ckpt[ckpts[0]]:
        raise SystemExit(f"base tag {args.base!r} not found")

    print(f"checkpoints: {ckpts}")
    print(f"base: {args.base}\n")

    hdr = (f"{'config':24s} | "
           + " | ".join(f"ckpt{c}" for c in ckpts)
           + " | sign-stable | max|group spread|")
    # (metric, per-group key for the paired-delta error bar).  The
    # amodal splits (VERDICT r4 item 2) summarize exactly like the
    # aggregates; metrics absent from the file (older studies) are
    # skipped.
    metrics = (("track_ap50", "track_ap50_groups"),
               ("track_ap", None),
               ("det_ap", None),
               ("track_ap50_hp", "track_ap50_hp_groups"),
               ("det_ap50_hp", "det_ap50_hp_groups"),
               ("det_ap50_oof", "det_ap50_oof_groups"))
    any_row = by_ckpt[ckpts[0]][args.base]
    for metric, group_key in metrics:
        if metric not in any_row:
            continue
        print(f"== {metric} deltas vs base ==")
        print(hdr)
        for tag in tags:
            if tag == args.base:
                continue
            deltas, spreads = [], []
            for c in ckpts:
                row = by_ckpt[c].get(tag)
                base = by_ckpt[c].get(args.base)
                if row is None or base is None:
                    deltas.append(None)
                    continue
                deltas.append(row[metric] - base[metric])
                g = row.get(group_key) if group_key else None
                gb = base.get(group_key) if group_key else None
                if g and gb:
                    # Paired per-group deltas: shared-video noise
                    # cancels, so the spread of the PAIRED deltas is
                    # the right error bar for the aggregate delta.
                    pair = [a - b for a, b in zip(g, gb)]
                    spreads.append(statistics.pstdev(pair))
            known = [d for d in deltas if d is not None]
            stable = (len(known) == len(ckpts)
                      and (all(d > 0 for d in known)
                           or all(d < 0 for d in known)))
            cells = " | ".join(
                f"{d:+7.2f}" if d is not None else "   n/a "
                for d in deltas)
            sp = (f"{max(spreads):5.2f}" if spreads else "  n/a")
            print(f"{tag:24s} | {cells} | {str(stable):11s} | {sp}")
        print()

    print("== per-group track_ap50 (base) ==")
    for c in ckpts:
        row = by_ckpt[c].get(args.base, {})
        g = row.get("track_ap50_groups")
        if g:
            print(f"ckpt{c}: groups={g} agg={row['track_ap50']} "
                  f"pstdev={statistics.pstdev(g):.2f}")

    if args.compare:
        with open(args.compare) as f:
            other = json.load(f)
        print(f"\n== cross-run deltas: {args.compare} minus "
              f"{args.study} (same cell) ==")
        for key in sorted(results):
            if key not in other:
                continue
            a, b = results[key], other[key]
            cells = []
            for metric, group_key in metrics:
                if metric not in a or metric not in b:
                    continue
                d = b[metric] - a[metric]
                ga, gb = a.get(group_key), b.get(group_key)
                if group_key and ga and gb:
                    sp = statistics.pstdev(
                        [y - x for x, y in zip(ga, gb)])
                    cells.append(f"{metric} {d:+.2f}[±{sp:.2f}]")
                else:
                    cells.append(f"{metric} {d:+.2f}")
            print(f"{key:28s} " + "  ".join(cells))


if __name__ == "__main__":
    main()
