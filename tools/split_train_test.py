#!/usr/bin/env python3
"""Split a data list into train/dev/test (reference: tools/split_train_test.py)."""

import argparse
import random
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("list_file")
    ap.add_argument("--train", default="train.list")
    ap.add_argument("--dev", default="dev.list")
    ap.add_argument("--test", default="test.list")
    ap.add_argument("--dev_ratio", type=float, default=0.05)
    ap.add_argument("--test_ratio", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=777)
    args = ap.parse_args()

    with open(args.list_file, encoding="utf-8") as f:
        lines = [ln for ln in f if ln.strip()]
    random.Random(args.seed).shuffle(lines)
    n = len(lines)
    n_dev = int(n * args.dev_ratio)
    n_test = int(n * args.test_ratio)
    splits = {args.dev: lines[:n_dev],
              args.test: lines[n_dev:n_dev + n_test],
              args.train: lines[n_dev + n_test:]}
    for path, ls in splits.items():
        with open(path, "w", encoding="utf-8") as f:
            f.writelines(ls)
        print(f"{path}: {len(ls)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
