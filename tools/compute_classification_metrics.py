#!/usr/bin/env python3
"""Classification metrics (reference: tools/compute_classification_metrics.py):
accuracy / per-class precision-recall-F1 from prediction + reference TSVs."""

import argparse
import csv
import json
import sys
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hyp", required=True, help="TSV: key <task columns>")
    ap.add_argument("--ref", required=True, help="TSV: key <task columns>")
    args = ap.parse_args()

    def load(path):
        with open(path, newline="", encoding="utf-8") as f:
            return {r["key"]: r for r in csv.DictReader(f, delimiter="\t")}

    hyp = load(args.hyp)
    ref = load(args.ref)
    tasks = [c for c in next(iter(ref.values())).keys() if c != "key"]

    report = {}
    for task in tasks:
        tp = defaultdict(int)
        fp = defaultdict(int)
        fn = defaultdict(int)
        correct = n = 0
        for key, r in ref.items():
            if key not in hyp or task not in hyp[key]:
                continue
            n += 1
            y, p = r[task], hyp[key][task]
            if y == p:
                correct += 1
                tp[y] += 1
            else:
                fp[p] += 1
                fn[y] += 1
        per_class = {}
        for cls in set(list(tp) + list(fp) + list(fn)):
            prec = tp[cls] / max(tp[cls] + fp[cls], 1)
            rec = tp[cls] / max(tp[cls] + fn[cls], 1)
            f1 = 2 * prec * rec / max(prec + rec, 1e-9)
            per_class[cls] = {"precision": round(prec, 4), "recall": round(rec, 4),
                              "f1": round(f1, 4)}
        report[task] = {"accuracy": round(correct / max(n, 1), 4), "n": n,
                        "per_class": per_class}
    print(json.dumps(report, indent=2, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
