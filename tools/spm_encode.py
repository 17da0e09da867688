#!/usr/bin/env python3
"""Encode text with a sentencepiece model (reference: tools/spm_encode.py)."""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--output_format", choices=["piece", "id"], default="piece")
    ap.add_argument("--input", default="-")
    args = ap.parse_args()
    try:
        import sentencepiece as spm
    except ImportError:
        print("sentencepiece is not installed", file=sys.stderr)
        return 2
    sp = spm.SentencePieceProcessor()
    sp.load(args.model)
    fin = sys.stdin if args.input == "-" else open(args.input, encoding="utf-8")
    for line in fin:
        if args.output_format == "piece":
            print(" ".join(sp.encode_as_pieces(line.strip())))
        else:
            print(" ".join(map(str, sp.encode_as_ids(line.strip()))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
