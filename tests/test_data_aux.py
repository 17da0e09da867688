"""Aux data components: wav distortion, kaldi I/O, tokenizers."""

import numpy as np

from chunkformer_tpu.data import kaldi_io, wav_distortion
from chunkformer_tpu.data.tokenizer import BpeTokenizer, CharTokenizer


def test_wav_distortions_shapes_and_range():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=8000) * 0.2).astype(np.float32)
    for method in ("gain_db", "max_distortion", "fence_distortion",
                   "jag_distortion", "poly_distortion", "quad_distortion", "none"):
        y = wav_distortion.distort_chain(x, method, 0.05, rng)
        assert y.shape == x.shape
        assert np.isfinite(y).all()
    sample = {"waveform": x * 32768.0}
    out = wav_distortion.distort_wav_conf(
        sample, {"distortion_prob": 1.0, "distortion_method": "jag_distortion"},
        rng)
    assert out["waveform"].shape == x.shape


def test_kaldi_ark_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    items = [("utt1", rng.normal(size=(5, 3)).astype(np.float32)),
             ("utt2", rng.normal(size=(2, 3)).astype(np.float32)),
             ("vec1", rng.normal(size=7).astype(np.float32))]
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    kaldi_io.write_ark(ark, items, scp)

    got = dict(kaldi_io.read_ark(ark))
    assert set(got) == {"utt1", "utt2", "vec1"}
    for k, v in items:
        np.testing.assert_allclose(got[k], v)

    got_scp = dict(kaldi_io.read_scp(scp))
    np.testing.assert_allclose(got_scp["utt2"], items[1][1])


def test_char_tokenizer_roundtrip():
    table = {"<blank>": 0, "<unk>": 1, "a": 2, "b": 3, "▁": 4, "<sos/eos>": 5}
    tok = CharTokenizer(table)
    tokens, ids = tok.tokenize("ab a")
    assert tokens == ["a", "b", "▁", "a"]
    text, _ = tok.detokenize(ids)
    assert text == "ab a"


def test_bpe_greedy_fallback():
    table = {"<blank>": 0, "<unk>": 1, "▁he": 2, "llo": 3, "▁wo": 4, "rld": 5}
    tok = BpeTokenizer(table)
    tokens, ids = tok.tokenize("hello world")
    assert tokens == ["▁he", "llo", "▁wo", "rld"]
    text, _ = tok.detokenize(ids)
    assert text == "hello world"


def test_non_lang_symbols():
    table = {"<blank>": 0, "<unk>": 1, "{noise}": 2, "a": 3, "▁": 4}
    tok = CharTokenizer(table, non_lang_syms=["{noise}"])
    tokens, _ = tok.tokenize("a{noise}a")
    assert tokens == ["a", "{noise}", "a"]
