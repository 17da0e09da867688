#!/usr/bin/env python3
"""TSV -> data list conversion (reference: tools/tsv_to_list.py).

Input TSV columns: key/wav/txt (header optional). Output: tab-separated
`key wav txt` lines consumed by the data pipeline.
"""

import argparse
import csv
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tsv")
    ap.add_argument("out")
    ap.add_argument("--wav_col", default="wav")
    ap.add_argument("--txt_col", default="txt")
    ap.add_argument("--key_col", default="key")
    args = ap.parse_args()

    with open(args.tsv, newline="", encoding="utf-8") as f, \
            open(args.out, "w", encoding="utf-8") as out:
        reader = csv.DictReader(f, delimiter="\t")
        for i, row in enumerate(reader):
            key = row.get(args.key_col) or f"utt{i}"
            wav = row[args.wav_col]
            txt = row.get(args.txt_col, "")
            out.write(f"{key}\t{wav}\t{txt}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
