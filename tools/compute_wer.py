#!/usr/bin/env python3
"""WER scorer with alignment display (reference: tools/compute-wer.py).

Usage: python tools/compute_wer.py [--char] [--verbose] ref.txt hyp.txt
Input format per line: `utt-key transcript ...`
"""

import argparse
import re
import sys
import unicodedata


def characterize(text):
    """Split into scoring tokens: CJK chars separate, latin words whole."""
    tokens = []
    word = ""
    for ch in text:
        if unicodedata.category(ch).startswith("Lo"):  # CJK and similar
            if word:
                tokens.append(word)
                word = ""
            tokens.append(ch)
        elif ch.isspace():
            if word:
                tokens.append(word)
                word = ""
        else:
            word += ch
    if word:
        tokens.append(word)
    return tokens


def edit_alignment(ref, hyp):
    """Levenshtein with backtrace -> (dist, ops) where ops in {ok,sub,ins,del}."""
    n, m = len(ref), len(hyp)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        dp[i][0] = i
    for j in range(m + 1):
        dp[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1, dp[i - 1][j - 1] + cost)
    ops = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i][j] == dp[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1]):
            ops.append("ok" if ref[i - 1] == hyp[j - 1] else "sub")
            i, j = i - 1, j - 1
        elif j > 0 and dp[i][j] == dp[i][j - 1] + 1:
            ops.append("ins")
            j -= 1
        else:
            ops.append("del")
            i -= 1
    return dp[n][m], list(reversed(ops))


def load(path, to_char, case_sensitive, ignore=None, clusters=None,
         keep_tags=False):
    out = {}
    ignore = ignore or set()
    clusters = clusters or {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if not parts:
                continue
            key = parts[0]
            text = parts[1] if len(parts) > 1 else ""
            if not case_sensitive:
                text = text.lower()
            if not keep_tags:
                text = re.sub(r"<[^>]+>", "", text)
            toks = characterize(text) if to_char else text.split()
            toks = [clusters.get(t, t) for t in toks if t not in ignore]
            out[key] = toks
    return out


def load_ignore(path, case_sensitive):
    """One word per line; removed from ref and hyp before scoring
    (reference: tools/compute-wer.py --ig)."""
    words = set()
    if path:
        for line in open(path, encoding="utf-8"):
            w = line.strip()
            if w:
                words.add(w if case_sensitive else w.lower())
    return words


def load_clusters(path, case_sensitive):
    """Cluster file: each line `canonical member1 member2 ...`; members score
    as their canonical token (reference: tools/compute-wer.py cluster files)."""
    mapping = {}
    if path:
        for line in open(path, encoding="utf-8"):
            toks = line.split()
            if len(toks) >= 2:
                if not case_sensitive:
                    toks = [t.lower() for t in toks]
                for member in toks[1:]:
                    mapping[member] = toks[0]
    return mapping


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref")
    ap.add_argument("hyp")
    ap.add_argument("--char", action="store_true", help="character-level scoring")
    ap.add_argument("--verbose", "-v", action="store_true")
    ap.add_argument("--case-sensitive", action="store_true")
    ap.add_argument("--ig", help="ignore-words file (one word per line)")
    ap.add_argument("--cluster", help="cluster file: canonical member...")
    ap.add_argument("--keep-tags", action="store_true",
                    help="score <...> tags instead of stripping them")
    ap.add_argument("--max-words-per-line", type=int, default=0,
                    help="wrap verbose REF/HYP alignment lines")
    args = ap.parse_args()

    ignore = load_ignore(args.ig, args.case_sensitive)
    clusters = load_clusters(args.cluster, args.case_sensitive)
    refs = load(args.ref, args.char, args.case_sensitive, ignore, clusters,
                args.keep_tags)
    hyps = load(args.hyp, args.char, args.case_sensitive, ignore, clusters,
                args.keep_tags)

    total_err = total_words = 0
    subs = inss = dels = 0
    n_utts = n_correct = 0
    for key, ref in refs.items():
        hyp = hyps.get(key, [])
        dist, ops = edit_alignment(ref, hyp)
        total_err += dist
        total_words += len(ref)
        subs += ops.count("sub")
        inss += ops.count("ins")
        dels += ops.count("del")
        n_utts += 1
        if dist == 0:
            n_correct += 1
        if args.verbose:
            print(f"utt: {key}")
            ri, hi = 0, 0
            r_line, h_line = [], []
            for op in ops:
                r = ref[ri] if op in ("ok", "sub", "del") else "*" * 3
                h = hyp[hi] if op in ("ok", "sub", "ins") else "*" * 3
                width = max(len(r), len(h))
                r_line.append(r.ljust(width))
                h_line.append(h.ljust(width))
                ri += op in ("ok", "sub", "del")
                hi += op in ("ok", "sub", "ins")
            wrap = args.max_words_per_line or len(r_line) or 1
            for s in range(0, max(len(r_line), 1), wrap):
                print("REF:", " ".join(r_line[s:s + wrap]))
                print("HYP:", " ".join(h_line[s:s + wrap]))
            wer = dist / max(len(ref), 1) * 100
            print(f"WER: {wer:.2f}% N={len(ref)} S={ops.count('sub')} "
                  f"I={ops.count('ins')} D={ops.count('del')}\n")

    wer = total_err / max(total_words, 1) * 100
    print(f"Overall -> {wer:.2f}% N={total_words} "
          f"S={subs} I={inss} D={dels}")
    print(f"SER -> {100 * (1 - n_correct / max(n_utts, 1)):.2f}% "
          f"({n_utts - n_correct}/{n_utts})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
