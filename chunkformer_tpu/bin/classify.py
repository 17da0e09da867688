"""`chunkformer-classify` CLI (reference: chunkformer/bin/classify.py):
batch classification inference -> TSV/JSONL."""

from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ChunkFormer-TPU classification")
    p.add_argument("--model_checkpoint", required=True)
    p.add_argument("--test_data", required=True)
    p.add_argument("--output_file", required=True)
    p.add_argument("--format", choices=["tsv", "jsonl"], default="tsv")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import os

    import jax

    from ..api import ChunkFormerModel
    from ..data.pipeline import text_line_source
    from ..models.classification import classify_predict

    model = ChunkFormerModel.from_pretrained(args.model_checkpoint)
    label_mapping = None
    lm_path = os.path.join(args.model_checkpoint, "label_mapping.json")
    if os.path.exists(lm_path):
        with open(lm_path) as f:
            label_mapping = json.load(f)

    samples = list(text_line_source(args.test_data))
    with open(args.output_file, "w") as out:
        header_written = False
        for s in samples:
            feats = model.extract_features(s["wav"])
            preds = classify_predict(
                model.params, model.config, feats[None],
                np.asarray([feats.shape[0]], np.int32), label_mapping)
            if args.format == "jsonl":
                out.write(json.dumps({"key": s.get("key", s["wav"]), **preds}) + "\n")
            else:
                tasks = sorted(preds.keys())
                if not header_written:
                    out.write("key\t" + "\t".join(tasks) + "\n")
                    header_written = True
                out.write(s.get("key", s["wav"]) + "\t"
                          + "\t".join(preds[t]["label"] for t in tasks) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
