"""Input-pipeline throughput benchmark: utterances/s into a no-op step.

VERDICT r1 item 4 done-criterion. Generates synthetic wavs once, then drives
the full Dataset chain (decode -> fbank -> tokenize -> filter -> batch ->
collate) with prefetch on/off and static/bucket/dynamic batching, consuming
batches with a no-op. Run on any host:

    PYTHONPATH=. python tools/bench_pipeline.py [--n 512] [--seconds 8]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(root: str, n: int, seconds: float):
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        path = os.path.join(root, f"w{i}.wav")
        t = int(16000 * seconds * rng.uniform(0.5, 1.5))
        wavfile.write(path, 16000, (rng.normal(size=t) * 3000).astype(np.int16))
        lines.append(f"u{i}\t{path}\txin chao the gioi\n")
    lst = os.path.join(root, "data.list")
    with open(lst, "w") as f:
        f.writelines(lines)
    units = os.path.join(root, "units.txt")
    with open(units, "w", encoding="utf-8") as f:
        f.write("<blank> 0\n<unk> 1\n")
        for i, ch in enumerate(sorted(set("xinchaothegioi ")), start=2):
            f.write(f"{'▁' if ch == ' ' else ch} {i}\n")
    return lst, units


def run_once(lst, units, conf):
    from chunkformer_tpu.data.pipeline import Dataset
    from chunkformer_tpu.data.tokenizer import build_tokenizer

    tok = build_tokenizer("char", {"symbol_table_path": units})
    ds = Dataset("raw", lst, tok, conf)
    t0 = time.perf_counter()
    utts = batches = 0
    for batch in ds:
        utts += batch["feats"].shape[0]
        batches += 1
    dt = time.perf_counter() - t0
    return utts / dt, batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()

    base = {
        "fbank_conf": {"num_mel_bins": 80, "dither": 0.0},
        "filter_conf": {"max_length": 102400},
        "shuffle": False, "sort": True,
    }
    variants = [
        ("static, no prefetch", {**base, "batch_conf": {"batch_size": 16}}),
        ("static, prefetch=8", {**base, "batch_conf": {"batch_size": 16},
                                "prefetch_buffer": 8}),
        ("bucket, prefetch=8", {**base, "prefetch_buffer": 8,
                                "batch_conf": {"batch_type": "bucket",
                                               "bucket_boundaries": [800, 1200],
                                               "bucket_batch_sizes": [24, 16, 8]}}),
        ("dynamic, prefetch=8", {**base, "prefetch_buffer": 8,
                                 "batch_conf": {"batch_type": "dynamic",
                                                "max_frames_in_batch": 16000}}),
    ]
    with tempfile.TemporaryDirectory() as root:
        lst, units = make_data(root, args.n, args.seconds)
        for name, conf in variants:
            rate, batches = run_once(lst, units, conf)
            print(f"{name:22s}: {rate:8.1f} utts/s  ({batches} batches)")


if __name__ == "__main__":
    main()
