#!/usr/bin/env python3
"""Train a sentencepiece BPE model (reference: tools/spm_train.py).
Requires the sentencepiece package."""

import sys


def main():
    try:
        import sentencepiece as spm
    except ImportError:
        print("sentencepiece is not installed; character units "
              "(examples/asr/ctc/run.sh stage 2) work without it", file=sys.stderr)
        return 2
    spm.SentencePieceTrainer.train(" ".join(sys.argv[1:]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
