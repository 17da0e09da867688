#!/usr/bin/env python3
"""Emit the token FST (T) for WFST decoding, in AT&T text format.

T maps frame-level label sequences produced by the acoustic model to token
sequences: it absorbs CTC blanks and collapses repeats (or, for RNN-T, just
absorbs blanks — the transducer never emits repeats for one token).

TPU-framework counterpart of the reference emitters
(reference: tools/fst/ctc_token_fst.py, ctc_token_fst_compact.py,
ctc_token_fst_corrected.py, rnnt_token_fst.py), re-written from the CTC/RNN-T
topology semantics rather than ported.

Usage:
    token_fst.py --style {ctc,ctc_compact,rnnt} units.txt > T.txt

units.txt: `token id` per line, including <blank> 0. Output arcs use
`<eps>`/`<blank>` input symbol names matching the tokens.txt produced by
make_tlg.sh.
"""

import argparse
import sys


def read_units(path):
    units = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if parts:
                units.append(parts[0])
    return units


def emit_ctc(units, out):
    """Full CTC topology: state 1 = blank hub, one state per token.

    From the hub, token t is emitted on its first frame (arc hub->state_t with
    output t); repeats self-loop silently; blank returns to the hub; a
    different token t' transitions directly (emitting t'). Token-final states
    are all final, so trailing blanks are optional.
    """
    print("0 1 <eps> <eps>", file=out)  # start -> hub (free)
    print("1 1 <blank> <eps>", file=out)
    tokens = [u for u in units if u not in ("<eps>", "<blank>")]
    # state ids: hub=1, token states start at 2
    sid = {t: i + 2 for i, t in enumerate(tokens)}
    for t in tokens:
        print(f"1 {sid[t]} {t} {t}", file=out)
        print(f"{sid[t]} {sid[t]} {t} <eps>", file=out)  # repeat collapse
        print(f"{sid[t]} 1 <blank> <eps>", file=out)     # back to hub
        for u in tokens:
            if u != t:
                print(f"{sid[t]} {sid[u]} {u} {u}", file=out)
    print("0", file=out)  # empty sequence accepted
    print("1", file=out)
    for t in tokens:
        print(f"{sid[t]}", file=out)


def emit_ctc_compact(units, out):
    """Compact topology: self-loops on a single state; repeats NOT collapsed
    across blanks (adequate when the LM composition re-restricts anyway)."""
    print("0 0 <blank> <eps>", file=out)
    for t in (u for u in units if u not in ("<eps>", "<blank>")):
        print(f"0 0 {t} {t}", file=out)
    print("0", file=out)


def emit_rnnt(units, out):
    """RNN-T: blanks absorbed, every non-blank emitted verbatim."""
    print("0 0 <blank> <eps>", file=out)
    for t in (u for u in units if u not in ("<eps>", "<blank>")):
        print(f"0 0 {t} {t}", file=out)
    print("0", file=out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--style", choices=["ctc", "ctc_compact", "rnnt"],
                    default="ctc")
    ap.add_argument("units", help="units.txt (token id per line)")
    args = ap.parse_args()
    units = read_units(args.units)
    {"ctc": emit_ctc, "ctc_compact": emit_ctc_compact,
     "rnnt": emit_rnnt}[args.style](units, sys.stdout)


if __name__ == "__main__":
    main()
