#!/usr/bin/env python3
"""Classification label statistics (reference: tools/compute_label_stats.py):
per-task class counts/distribution from a jsonl/TSV data list."""

import argparse
import json
import sys
from collections import Counter, defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("list_file")
    ap.add_argument("--out", default=None, help="optional json output")
    args = ap.parse_args()

    stats = defaultdict(Counter)
    total = 0
    with open(args.list_file, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line) if line.startswith("{") else None
            if row is None:
                continue
            total += 1
            for k, v in row.items():
                if k.startswith("label_"):
                    stats[k[len("label_"):]][str(v)] += 1
                elif k == "class_labels" and isinstance(v, dict):
                    for t, lv in v.items():
                        stats[t][str(lv)] += 1

    out = {"total": total,
           "tasks": {t: dict(c.most_common()) for t, c in stats.items()}}
    print(json.dumps(out, indent=2, ensure_ascii=False))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2, ensure_ascii=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
