#!/usr/bin/env bash
# Build the TLG decoding graph: T (token) o det(L (lexicon) o G (LM)).
#
# TPU-framework counterpart of the reference graph build
# (reference: tools/fst/make_tlg.sh): same external OpenFST/Kaldi binaries
# (fstcompile, fsttablecompose, fstdeterminizestar, arpa2fst, ...), with the
# T/L text emitters replaced by tools/fst/token_fst.py and lexicon_fst.py.
#
# Usage: make_tlg.sh <units.txt> <words-or-lexicon list> <lm.arpa> <out_dir>
set -euo pipefail
[ $# -eq 4 ] || { echo "usage: $0 units.txt wordlist lm.arpa out_dir"; exit 1; }
units=$1; wordlist=$2; arpa=$3; dir=$4
here=$(dirname "$0")
mkdir -p "$dir"

for bin in fstcompile fsttablecompose fstdeterminizestar fstminimizeencoded \
           fstarcsort arpa2fst; do
  command -v $bin >/dev/null || {
    echo "$bin not found: install OpenFST + Kaldi fstbin tools"; exit 2; }
done

python3 "$here/lexicon_fst.py" --units "$units" --words "$wordlist" --dir "$dir"

# T: token fst over tokens.txt
python3 "$here/token_fst.py" --style ctc "$units" > "$dir/T.txt"
fstcompile --isymbols="$dir/tokens.txt" --osymbols="$dir/tokens.txt" \
  "$dir/T.txt" | fstarcsort --sort_type=olabel > "$dir/T.fst"

# L: lexicon fst
fstcompile --isymbols="$dir/tokens.txt" --osymbols="$dir/words.txt" \
  "$dir/L.txt" | fstarcsort --sort_type=olabel > "$dir/L.fst"

# G: grammar from arpa, OOVs relabeled to <eps>, #0 for backoff
arpa2fst --read-symbol-table="$dir/words.txt" --disambig-symbol=#0 \
  "$arpa" "$dir/G.fst"

# TLG
fsttablecompose "$dir/L.fst" "$dir/G.fst" | fstdeterminizestar --use-log=true \
  | fstminimizeencoded | fstarcsort --sort_type=ilabel > "$dir/LG.fst"
fsttablecompose "$dir/T.fst" "$dir/LG.fst" > "$dir/TLG.fst"
echo "built $dir/TLG.fst"
