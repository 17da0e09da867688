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

def test_kaldi_vec_int_roundtrip(tmp_path):
    ark = str(tmp_path / "ali.ark")
    with open(ark, "wb") as f:
        kaldi_io.write_vec_int(f, [3, 1, 4, 1, 5], key="u1")
        kaldi_io.write_vec_int(f, np.arange(0, dtype=np.int32), key="u2")
        kaldi_io.write_vec_int(f, [-7, 2**20], key="u3")
    got = dict(kaldi_io.read_vec_int_ark(ark))
    np.testing.assert_array_equal(got["u1"], [3, 1, 4, 1, 5])
    assert got["u2"].size == 0
    np.testing.assert_array_equal(got["u3"], [-7, 2**20])
    # alignment alias
    assert dict(kaldi_io.read_ali_ark(ark)).keys() == got.keys()


def test_kaldi_vec_flt_scp_and_dtypes(tmp_path):
    ark = str(tmp_path / "v.ark")
    scp_lines = []
    with open(ark, "wb") as f:
        for key, v in (("a", np.array([1.5, -2.25], np.float32)),
                       ("b", np.array([3.0, 4.0, 5.0], np.float64))):
            f.write((key + " ").encode())
            scp_lines.append(f"{key} {ark}:{f.tell()}")
            kaldi_io.write_vec_flt(f, v)
    scp = tmp_path / "v.scp"
    scp.write_text("\n".join(scp_lines) + "\n")
    got = dict(kaldi_io.read_vec_flt_scp(str(scp)))
    np.testing.assert_allclose(got["a"], [1.5, -2.25])
    assert got["b"].dtype == np.float64
    got_ark = dict(kaldi_io.read_vec_flt_ark(ark))
    np.testing.assert_allclose(got_ark["b"], [3.0, 4.0, 5.0])


def test_kaldi_mat_scp_ark_and_double(tmp_path):
    rng = np.random.default_rng(2)
    ark = str(tmp_path / "m.ark")
    m32 = rng.normal(size=(4, 6)).astype(np.float32)
    m64 = rng.normal(size=(2, 2)).astype(np.float64)
    with open(ark, "wb") as f, open(tmp_path / "m.scp", "w") as s:
        kaldi_io.write_ark_scp("m32", m32, f, s)
        kaldi_io.write_ark_scp("m64", m64, f, s)
    got = dict(kaldi_io.read_mat_ark(ark))
    np.testing.assert_allclose(got["m32"], m32)
    np.testing.assert_allclose(got["m64"], m64)
    assert got["m64"].dtype == np.float64
    got_scp = dict(kaldi_io.read_mat_scp(str(tmp_path / "m.scp")))
    np.testing.assert_allclose(got_scp["m32"], m32)


def test_kaldi_ascii_matrix_and_vector(tmp_path):
    p = tmp_path / "ascii.txt"
    p.write_text("  [\n  1 2 3\n  4 5 6 ]\n")
    m = kaldi_io.read_mat(str(p))
    np.testing.assert_allclose(m, [[1, 2, 3], [4, 5, 6]])
    v = tmp_path / "vec.txt"
    v.write_text(" [ 1.5 2.5 ]\n")
    np.testing.assert_allclose(kaldi_io.read_vec_flt(str(v)), [1.5, 2.5])


def test_kaldi_compressed_matrix(tmp_path):
    """Synthesize a 'CM ' compressed matrix per the Kaldi layout and check
    the decoder reconstructs within quantization error."""
    import struct as st

    rng = np.random.default_rng(3)
    rows, cols = 20, 5
    mat = rng.normal(size=(rows, cols)).astype(np.float32) * 10
    gmin = float(mat.min())
    grange = float(mat.max() - mat.min()) or 1.0

    def to_u16(x):
        return np.clip((x - gmin) / grange * 65535, 0, 65535).astype(np.uint16)

    buf = b"CM " + st.pack("<ffii", gmin, grange, rows, cols)
    headers, codes = [], []
    for j in range(cols):
        col = np.sort(mat[:, j])
        p0, p25, p75, p100 = (col[0], col[rows // 4], col[(3 * rows) // 4],
                              col[-1])
        q = to_u16(np.array([p0, p25, p75, p100]))
        # dequantized percentile values (what the decoder will use)
        dp0, dp25, dp75, dp100 = gmin + grange / 65535.0 * q.astype(np.float64)
        headers.append(q)
        c = np.empty(rows, np.uint8)
        x = mat[:, j]
        lo = x <= dp25
        hi = x > dp75
        mid = ~(lo | hi)
        c[lo] = np.clip(np.round((x[lo] - dp0) / max(dp25 - dp0, 1e-9) * 64),
                        0, 64)
        c[mid] = 64 + np.clip(
            np.round((x[mid] - dp25) / max(dp75 - dp25, 1e-9) * 128), 1, 128)
        c[hi] = 192 + np.clip(
            np.round((x[hi] - dp75) / max(dp100 - dp75, 1e-9) * 63), 1, 63)
        codes.append(c)
    buf += np.concatenate(headers).tobytes()
    buf += np.stack(codes).tobytes()  # col-major [cols, rows]
    p = tmp_path / "cm.bin"
    p.write_bytes(b"\0B" + buf)
    got = kaldi_io.read_mat(str(p))
    assert got.shape == (rows, cols)
    err = np.abs(got - mat).max()
    assert err < grange / 60, err  # uint8 quantization bound


def test_kaldi_post_and_cntime_roundtrip(tmp_path):
    import struct as st

    def write_pairs_int_float(f, pairs_list):
        f.write(b"\0B\x04" + st.pack("<i", len(pairs_list)))
        for pairs in pairs_list:
            f.write(b"\x04" + st.pack("<i", len(pairs)))
            for i, w in pairs:
                f.write(b"\x04" + st.pack("<i", i) + b"\x04" + st.pack("<f", w))

    p = tmp_path / "post.ark"
    with open(p, "wb") as f:
        f.write(b"u1 ")
        write_pairs_int_float(f, [[(1, 0.5), (2, 0.5)], [(3, 1.0)]])
    got = dict(kaldi_io.read_post_ark(str(p)))
    assert got["u1"][0][0][0] == 1
    np.testing.assert_allclose([w for _, w in got["u1"][0]], [0.5, 0.5])

    c = tmp_path / "cntime.ark"
    with open(c, "wb") as f:
        f.write(b"u1 \0B\x04" + st.pack("<i", 2))
        for b_, e_ in ((0.0, 0.5), (0.5, 1.25)):
            f.write(b"\x04" + st.pack("<f", b_) + b"\x04" + st.pack("<f", e_))
    got_c = dict(kaldi_io.read_cntime_ark(str(c)))
    np.testing.assert_allclose(got_c["u1"], [(0.0, 0.5), (0.5, 1.25)])


def test_kaldi_segments_bool_vec(tmp_path):
    p = tmp_path / "segments"
    p.write_text("seg1 rec1 0.10 0.25\nseg2 rec1 0.50 0.60\n")
    vec = kaldi_io.read_segments_as_bool_vec(str(p))
    assert vec.size == 60
    assert vec[10:25].all() and not vec[25:50].any() and vec[50:60].all()


def test_kaldi_open_or_fd_pipe_and_offset(tmp_path):
    rng = np.random.default_rng(4)
    m = rng.normal(size=(3, 2)).astype(np.float32)
    ark = str(tmp_path / "p.ark")
    with open(ark, "wb") as f:
        f.write(b"k1 ")
        off = f.tell()
        kaldi_io.write_mat(f, m)
    # offset specifier
    np.testing.assert_allclose(kaldi_io.read_mat(f"{ark}:{off}"), m)
    # pipe specifier
    got = dict(kaldi_io.read_mat_ark(f"cat {ark} |"))
    np.testing.assert_allclose(got["k1"], m)


def test_convert_text_labels_tool(tmp_path):
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "convert_labels", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools",
            "convert_text_labels_to_int.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    tsv = tmp_path / "data.tsv"
    tsv.write_text("key\twav\tgender_label\temotion_label\n"
                   "u1\ta.wav\tmale\thappy\n"
                   "u2\tb.wav\tfemale\tsad\n"
                   "u3\tc.wav\tmale\tsad\n")
    out_path, mapping_path, mapping = mod.convert(str(tsv), ["gender", "emotion"])
    # input named data.tsv is preserved as data_original.tsv
    assert (tmp_path / "data_original.tsv").exists()
    rows = (tmp_path / "data.tsv").read_text().strip().split("\n")
    assert rows[1].split("\t")[2:] == ["0", "0"]
    assert rows[2].split("\t")[2:] == ["1", "1"]
    assert rows[3].split("\t")[2:] == ["0", "1"]
    m = json.loads((tmp_path / "label_mapping.json").read_text())
    assert m["gender"] == {"0": "male", "1": "female"}
    assert m["emotion"] == {"0": "happy", "1": "sad"}


def test_parse_options_sh(tmp_path):
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "demo.sh"
    script.write_text(
        "#!/usr/bin/env bash\nstage=0\nnum_jobs=4\n"
        f". {repo}/tools/parse_options.sh\n"
        'echo "$stage $num_jobs $@"\n')
    out = subprocess.run(
        ["bash", str(script), "--stage", "3", "--num-jobs=8", "pos1", "pos2"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "3 8 pos1 pos2"
    bad = subprocess.run(["bash", str(script), "--nope", "1"],
                         capture_output=True, text=True)
    assert bad.returncode != 0 and "unknown option" in bad.stderr
