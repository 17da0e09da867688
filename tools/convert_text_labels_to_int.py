#!/usr/bin/env python3
"""Convert text classification labels in a TSV to integer ids + mapping json.

Behavioral counterpart of the reference tool
(reference: tools/convert_text_labels_to_int.py): given a TSV with
``<task>_label`` columns holding text labels, rewrite them as integer ids
(assigned in first-seen order per task) and emit ``label_mapping.json``
mapping ``task -> {id: text}`` — the file the classification model loads.
The converted file is always written as ``data.tsv``; an input already named
``data.tsv`` is first preserved as ``data_original.tsv``.

Usage:
    python tools/convert_text_labels_to_int.py -i data.tsv -t gender emotion
"""

import argparse
import csv
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Convert text classification labels to integer labels")
    p.add_argument("--input", "-i", required=True,
                   help="Input TSV with text labels")
    p.add_argument("--tasks", "-t", nargs="+", required=True,
                   help="Task names (columns are <task>_label)")
    p.add_argument("--output_dir", "-o", default=None,
                   help="Output directory (default: the input's directory)")
    return p.parse_args(argv)


def convert(input_path: str, tasks, output_dir=None):
    output_dir = output_dir or (os.path.dirname(os.path.abspath(input_path)))
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "data.tsv")
    if os.path.abspath(input_path) == os.path.abspath(out_path):
        backup = os.path.join(output_dir, "data_original.tsv")
        os.replace(input_path, backup)
        input_path = backup

    with open(input_path, encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t")
        rows = list(reader)
        fields = reader.fieldnames or []

    label_cols = {t: f"{t}_label" for t in tasks}
    for t, col in label_cols.items():
        if col not in fields:
            raise SystemExit(f"column {col!r} not in {input_path} ({fields})")

    # first-seen-order id assignment per task
    text_to_id = {t: {} for t in tasks}
    for row in rows:
        for t, col in label_cols.items():
            text = row[col].strip()
            if text not in text_to_id[t]:
                text_to_id[t][text] = len(text_to_id[t])
            row[col] = str(text_to_id[t][text])

    with open(out_path, "w", encoding="utf-8", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields, delimiter="\t")
        writer.writeheader()
        writer.writerows(rows)

    mapping = {t: {str(i): text for text, i in m.items()}
               for t, m in text_to_id.items()}
    mapping_path = os.path.join(output_dir, "label_mapping.json")
    with open(mapping_path, "w", encoding="utf-8") as f:
        json.dump(mapping, f, ensure_ascii=False, indent=4)
    return out_path, mapping_path, mapping


def main(argv=None):
    args = parse_args(argv)
    out_path, mapping_path, mapping = convert(args.input, args.tasks,
                                              args.output_dir)
    for t, m in mapping.items():
        print(f"{t}: {len(m)} classes")
    print(f"wrote {out_path} and {mapping_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
