"""WER-threshold integration tests against published checkpoints.

Mirror of the reference's own test suite
(reference: tests/test_wer_ctc_performance.py:57-238): download
`khanhld/chunkformer-ctc-large-vie` from the HF Hub, decode the bundled
sample wavs, and assert WER < 10% plus endless<->batch equivalence < 1%.

This environment has no network egress, so these tests SKIP here; the
numerical-parity evidence is instead provided by
tests/test_reference_parity.py (identical weights through the actual
reference torch modules). On any host with Hub access this file runs the
real thing.
"""

import os

import numpy as np
import pytest

SAMPLES = "/root/reference/samples"
CTC_REPO = "khanhld/chunkformer-ctc-large-vie"


def _load_samples():
    import csv

    tsv = os.path.join(SAMPLES, "data.tsv")
    if not os.path.exists(tsv):
        pytest.skip("reference samples not mounted")
    rows = []
    with open(tsv, encoding="utf-8") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            wav = row.get("wav") or row.get("audio") or ""
            if not os.path.isabs(wav):
                # tsv paths are relative to the repo root ("samples/audios/..")
                wav = os.path.join(os.path.dirname(SAMPLES), wav)
            rows.append({"wav": wav, "txt": row.get("txt", row.get("text", ""))})
    return rows


@pytest.fixture(scope="module")
def ctc_model():
    from chunkformer_tpu.api import ChunkFormerModel

    try:
        model = ChunkFormerModel.from_pretrained(CTC_REPO)
    except Exception as e:  # noqa: BLE001 — no network in CI sandboxes
        pytest.skip(f"hub unreachable: {e}")
    return model


@pytest.mark.performance
def test_endless_decode_wer(ctc_model):
    from chunkformer_tpu.decode.outputs import word_error_rate

    rows = _load_samples()
    hyps, refs = [], []
    for row in rows:
        text = ctc_model.endless_decode(row["wav"], chunk_size=64,
                                        left_context_size=128,
                                        right_context_size=128,
                                        total_batch_duration=1800,
                                        return_timestamps=False)
        hyps.append(text.lower())
        refs.append(row["txt"].lower())
    wer = word_error_rate(hyps, refs)
    assert wer < 0.10, (wer, hyps)


@pytest.mark.performance
def test_batch_decode_matches_endless(ctc_model):
    from chunkformer_tpu.decode.outputs import word_error_rate

    rows = _load_samples()
    endless = [ctc_model.endless_decode(r["wav"], 64, 128, 128, 1800,
                                        return_timestamps=False).lower()
               for r in rows]
    batch = [t.lower() for t in ctc_model.batch_decode(
        [r["wav"] for r in rows], chunk_size=64, left_context_size=128,
        right_context_size=128)]
    refs = [r["txt"].lower() for r in rows]
    assert word_error_rate(batch, refs) < 0.10
    # the masked-batch and endless paths must agree within 1% cross-WER
    assert word_error_rate(batch, endless) < 0.01
