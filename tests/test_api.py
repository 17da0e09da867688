"""End-to-end API tests: from_pretrained, endless/batch decode, CLI.

Mirrors the reference test strategy (reference: tests/test_wer_ctc_performance.py)
but with synthesized checkpoints — no network, no real WER; the decode
*consistency* invariant (endless == batch) is asserted instead.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from tests.helpers import make_model_dir

SAMPLES = "/root/reference/samples/audios"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    make_model_dir(str(d))
    return str(d)


@pytest.fixture(scope="module")
def model(model_dir):
    from chunkformer_tpu.api import ChunkFormerModel

    return ChunkFormerModel.from_pretrained(model_dir)


def test_convert_structure_matches_init(model):
    """Converted params must have the same treedef as init_asr_model output."""
    from chunkformer_tpu.models.asr import init_asr_model

    init = init_asr_model(jax.random.PRNGKey(0), model.config)
    conv_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(model.params)}
    init_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    # converted tree may lack cmvn in init (init includes cmvn only when given)
    missing = {p for p in conv_paths - init_paths if "cmvn" not in str(p)}
    extra = {p for p in init_paths - conv_paths if "cmvn" not in str(p)}
    assert not missing, f"converter produces unknown params: {missing}"
    assert not extra, f"converter misses params: {extra}"
    for path, leaf in jax.tree_util.tree_leaves_with_path(init):
        if "cmvn" in str(path):
            continue
        conv_leaf = dict(jax.tree_util.tree_leaves_with_path(model.params))[path]
        assert leaf.shape == conv_leaf.shape, (path, leaf.shape, conv_leaf.shape)


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="sample audio not mounted")
def test_endless_vs_batch_decode_consistency(model):
    """The reference's key invariant (test_wer_ctc_performance.py:165-238):
    endless and masked-batch decode must agree."""
    wav = os.path.join(SAMPLES, "audio_1.wav")
    endless = model.endless_decode(wav, chunk_size=8, left_context_size=16,
                                   right_context_size=16, total_batch_duration=20,
                                   return_timestamps=False)
    batch = model.batch_decode([wav], chunk_size=8, left_context_size=16,
                               right_context_size=16)[0]
    assert isinstance(endless, str) and isinstance(batch, str)
    # random weights -> arbitrary tokens, but the two paths must agree
    assert endless == batch


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="sample audio not mounted")
def test_batch_decode_multiple_files(model):
    wavs = [os.path.join(SAMPLES, f"audio_{i}.wav") for i in (1, 2, 3)]
    hyps = model.batch_decode(wavs, chunk_size=8, left_context_size=16,
                              right_context_size=16)
    assert len(hyps) == 3


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="sample audio not mounted")
def test_cli_endless(model_dir):
    wav = os.path.join(SAMPLES, "audio_1.wav")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-m", "chunkformer_tpu.bin.decode",
         "--model_checkpoint", model_dir, "--audio_file", wav,
         "--chunk_size", "8", "--left_context_size", "16",
         "--right_context_size", "16", "--total_batch_duration", "20",
         "--dtype", "fp32"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env)
    assert out.returncode == 0, out.stderr[-2000:]


def test_timestamps_format():
    from chunkformer_tpu.decode.outputs import format_timestamp, get_output_with_timestamps

    assert format_timestamp(3661.25) == "01:01:01:250"
    char_dict = {1: "a", 2: "b"}
    # tokens at frames 0,1 then silence then frame 12
    frames = [1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2]
    segs = get_output_with_timestamps(frames, char_dict, max_silence_duration=0.5)
    assert len(segs) == 2
    assert segs[0]["decode"] == "a"
    assert segs[1]["decode"] == "b"


def test_wer():
    from chunkformer_tpu.decode.outputs import word_error_rate

    assert word_error_rate(["a b c"], ["a b c"]) == 0.0
    assert word_error_rate(["a x c"], ["a b c"]) == pytest.approx(1 / 3)


def test_resolve_model_dir_hub(monkeypatch, tmp_path):
    """Repo ids resolve via huggingface_hub.snapshot_download
    (reference: chunkformer_model.py:145-206); local dirs pass through;
    bad paths raise."""
    from chunkformer_tpu.api import ChunkFormerModel

    assert ChunkFormerModel._resolve_model_dir(str(tmp_path)) == str(tmp_path)
    with pytest.raises(FileNotFoundError):
        ChunkFormerModel._resolve_model_dir("/no/such/dir")

    import huggingface_hub

    calls = {}

    def fake_snapshot(repo_id, **kw):
        calls["repo_id"] = repo_id
        return "/tmp/fake_snapshot"

    monkeypatch.setattr(huggingface_hub, "snapshot_download", fake_snapshot)
    out = ChunkFormerModel._resolve_model_dir("khanhld/chunkformer-ctc-large-vie")
    assert out == "/tmp/fake_snapshot"
    assert calls["repo_id"] == "khanhld/chunkformer-ctc-large-vie"


def test_kaldi_text_cmvn_parse(tmp_path):
    """kaldi-text global cmvn (`compute-cmvn-stats --binary=false`) must parse
    to the same (mean, istd) as the json stats (reference: utils/cmvn.py:47-89
    reads both formats)."""
    from chunkformer_tpu.api import load_cmvn_file

    rng = np.random.default_rng(0)
    dim, count = 8, 1000.0
    mean_stat = rng.normal(size=dim) * count
    var_stat = (rng.random(dim) + 1.0) * count

    import json

    jp = tmp_path / "global_cmvn.json"
    jp.write_text(json.dumps({"mean_stat": mean_stat.tolist(),
                              "var_stat": var_stat.tolist(),
                              "frame_num": count}))
    kp = tmp_path / "global_cmvn"
    row1 = " ".join(str(v) for v in mean_stat) + f" {count}"
    row2 = " ".join(str(v) for v in var_stat) + " 0"
    kp.write_text(f" [ {row1} \n  {row2} ]\n")

    m_j, s_j = load_cmvn_file(str(jp), is_json=True)
    m_k, s_k = load_cmvn_file(str(kp), is_json=False)
    np.testing.assert_allclose(m_j, m_k, rtol=1e-6)
    np.testing.assert_allclose(s_j, s_k, rtol=1e-6)

    # binary kaldi files are rejected with a clear message, not mis-parsed
    bp = tmp_path / "global_cmvn_bin"
    bp.write_bytes(b"\0B garbage")
    with pytest.raises(ValueError, match="binary"):
        load_cmvn_file(str(bp), is_json=False)
