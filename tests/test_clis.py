"""End-to-end CLI subprocess tests: recognize, align, stream, train smoke."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers import make_model_dir

SAMPLES = "/root/reference/samples/audios"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=560):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # conftest sets an 8-virtual-device XLA_FLAGS for mesh tests; a CLI
    # subprocess inheriting it runs 8 oversubscribed CPU devices on a 2-core
    # host (~30x slowdown on sequential decode loops)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m"] + args, capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clim")
    make_model_dir(str(d))
    return str(d)


@pytest.fixture(scope="module")
def test_list(tmp_path_factory):
    if not os.path.isdir(SAMPLES):
        pytest.skip("sample audio not mounted")
    d = tmp_path_factory.mktemp("lists")
    path = d / "test.list"
    with open(path, "w") as f:
        f.write(f"utt1\t{SAMPLES}/audio_1.wav\txin chào\n")
        f.write(f"utt2\t{SAMPLES}/audio_3.wav\tmột hai ba\n")
    return str(path)


def test_recognize_cli(model_dir, test_list, tmp_path):
    out = _run(["chunkformer_tpu.bin.recognize",
                "--model_checkpoint", model_dir,
                "--test_data", test_list,
                "--modes", "ctc_greedy_search", "ctc_prefix_beam_search",
                "--result_dir", str(tmp_path / "results"),
                "--chunk_size", "8", "--left_context_size", "16",
                "--right_context_size", "16", "--beam_size", "4"])
    assert out.returncode == 0, out.stderr[-2000:]
    for mode in ("ctc_greedy_search", "ctc_prefix_beam_search"):
        assert os.path.exists(tmp_path / "results" / f"{mode}.txt")
        assert os.path.exists(tmp_path / "results" / f"{mode}.wer")


def test_recognize_cli_rnnt_modes(tmp_path, tmp_path_factory):
    """RNN-T decode modes in the recognize CLI (reference bin/recognize.py:63-72).

    Uses short synthetic wavs: the beam searches are sequential per frame on
    CPU, and minutes-long sample audio pushes this past the subprocess
    timeout on a loaded machine (the CLI wiring is what's under test)."""
    import wave

    from tests.test_reference_parity import TRANSDUCER_YAML

    d = tmp_path_factory.mktemp("rnnt_model")
    make_model_dir(str(d), yaml_dict=dict(TRANSDUCER_YAML))
    wav_dir = tmp_path_factory.mktemp("rnnt_wavs")
    rng = np.random.default_rng(0)
    lines = []
    for i, dur_s in enumerate((1.2, 0.7)):
        p = wav_dir / f"utt{i}.wav"
        pcm = (rng.normal(size=int(16000 * dur_s)) * 3000).astype(np.int16)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        lines.append(f"utt{i}\t{p}\tmột hai ba")
    test_list = wav_dir / "test.list"
    test_list.write_text("\n".join(lines) + "\n")
    out = _run(["chunkformer_tpu.bin.recognize",
                "--model_checkpoint", str(d),
                "--test_data", str(test_list),
                "--modes", "rnnt_greedy_search", "rnnt_beam_search",
                "rnnt_beam_attn_rescoring",
                "--result_dir", str(tmp_path / "results"),
                "--chunk_size", "8", "--left_context_size", "16",
                "--right_context_size", "16", "--beam_size", "2"])
    assert out.returncode == 0, out.stderr[-2000:]
    for mode in ("rnnt_greedy_search", "rnnt_beam_search",
                 "rnnt_beam_attn_rescoring"):
        assert os.path.exists(tmp_path / "results" / f"{mode}.txt")


def test_alignment_cli(model_dir, test_list, tmp_path):
    out = _run(["chunkformer_tpu.bin.alignment",
                "--model_checkpoint", model_dir,
                "--input_file", test_list,
                "--result_dir", str(tmp_path / "align")])
    assert out.returncode == 0, out.stderr[-2000:]
    grids = os.listdir(tmp_path / "align")
    assert any(g.endswith(".TextGrid") for g in grids)
    content = open(tmp_path / "align" / sorted(grids)[0]).read()
    assert "IntervalTier" in content


def test_stream_cli(model_dir):
    if not os.path.isdir(SAMPLES):
        pytest.skip("sample audio not mounted")
    out = _run(["chunkformer_tpu.bin.stream",
                "--model_checkpoint", model_dir,
                "--audio_file", f"{SAMPLES}/audio_1.wav",
                "--chunk_size", "6", "--left_context_size", "16"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "final:" in out.stdout


def test_train_cli_smoke(tmp_path):
    """One-epoch micro-training run through the full CLI path."""
    from scipy.io import wavfile

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        wav = data / f"w{i}.wav"
        wavfile.write(str(wav), 16000,
                      (rng.normal(size=8000) * 3000).astype(np.int16))
        lines.append(f"u{i}\t{wav}\tab ba\n")
    for name, ls in (("train.list", lines), ("dev.list", lines[:2])):
        with open(data / name, "w") as f:
            f.writelines(ls)
    units = data / "units.txt"
    units.write_text("<blank> 0\n<unk> 1\na 2\nb 3\n▁ 4\n<sos/eos> 5\n")

    import yaml

    cfg = {
        "encoder": "chunkformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 64, "num_blocks": 1,
                         "cnn_module_norm": "layer_norm", "dynamic_conv": True},
        "model": "asr_model",
        "model_conf": {"ctc_weight": 1.0},
        "tokenizer": "char",
        "tokenizer_conf": {"symbol_table_path": str(units)},
        "dataset_conf": {"fbank_conf": {"num_mel_bins": 80, "dither": 0.0},
                         "filter_conf": {"max_length": 2000},
                         "batch_conf": {"batch_type": "static", "batch_size": 2},
                         "shuffle": False, "sort": False},
        "max_epoch": 1,
        "log_interval": 1,
        "optim": "adam",
        "optim_conf": {"lr": 0.001},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 5},
    }
    cfg_path = data / "conf.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    exp = tmp_path / "exp"
    out = _run(["chunkformer_tpu.bin.train",
                "--config", str(cfg_path),
                "--train_data", str(data / "train.list"),
                "--cv_data", str(data / "dev.list"),
                "--model_dir", str(exp)])
    assert out.returncode == 0, (out.stderr[-3000:], out.stdout[-500:])
    assert os.path.exists(exp / "epoch_0.yaml")
    assert os.path.exists(exp / "train.yaml")
    assert os.path.exists(exp / "metrics.jsonl")


def test_recognize_cli_simulate_streaming(tmp_path, tmp_path_factory):
    """--simulate_streaming decodes through the streaming encoder step
    (reference: bin/recognize.py --simulate_streaming ->
    encoder.forward_chunk_by_chunk). With R=0 and the same (c, L) the
    chunked batch encode and the streaming step see identical context, so
    the transcripts must agree."""
    import wave

    d = tmp_path_factory.mktemp("sim_model")
    make_model_dir(str(d))
    wav_dir = tmp_path_factory.mktemp("sim_wavs")
    rng = np.random.default_rng(1)
    lines = []
    for i, dur_s in enumerate((1.4, 0.9)):
        p = wav_dir / f"utt{i}.wav"
        pcm = (rng.normal(size=int(16000 * dur_s)) * 3000).astype(np.int16)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        lines.append(f"utt{i}\t{p}\tmột hai")
    test_list = wav_dir / "test.list"
    test_list.write_text("\n".join(lines) + "\n")

    common = ["chunkformer_tpu.bin.recognize",
              "--model_checkpoint", str(d),
              "--test_data", str(test_list),
              "--modes", "ctc_greedy_search",
              "--chunk_size", "8", "--left_context_size", "16",
              "--right_context_size", "0"]
    out = _run(common + ["--simulate_streaming",
                         "--result_dir", str(tmp_path / "stream")])
    assert out.returncode == 0, out.stderr[-2000:]
    out2 = _run(common + ["--result_dir", str(tmp_path / "batch")])
    assert out2.returncode == 0, out2.stderr[-2000:]
    got = (tmp_path / "stream" / "ctc_greedy_search.txt").read_text()
    want = (tmp_path / "batch" / "ctc_greedy_search.txt").read_text()
    assert got == want


def test_eval_reference_wer_gate_runs(tmp_path):
    """tools/eval_reference_wer.py end-to-end with a random-weight export:
    the gate pipeline (endless + batch decode, WER + consistency metrics)
    must run and FAIL the thresholds (random weights), rc=1."""
    import csv

    import jax

    from chunkformer_tpu.config import ChunkFormerConfig
    from chunkformer_tpu.export import export_model_dir
    from chunkformer_tpu.models.asr import init_asr_model
    from tests.helpers import TINY_MODEL_YAML

    samples = "/root/reference/samples/data.tsv"
    if not os.path.exists(samples):
        import pytest

        pytest.skip("reference samples not mounted")

    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path / "export")
    export_model_dir(out, TINY_MODEL_YAML, params,
                     {f"t{i}": i for i in range(cfg.vocab_size)})

    rows = list(csv.DictReader(open(samples), delimiter="\t"))[:1]
    tsv = tmp_path / "data.tsv"
    with open(tsv, "w") as f:
        w = csv.DictWriter(f, fieldnames=rows[0].keys(), delimiter="\t")
        w.writeheader()
        for r in rows:
            r["wav"] = "/root/reference/" + r["wav"]
            w.writerow(r)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "eval_reference_wer.py"),
         "--model", out, "--data", str(tsv),
         "--chunk", "8", "--left", "16", "--right", "16"],
        capture_output=True, text=True, cwd=repo, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 1, (r.returncode, r.stdout[-500:], r.stderr[-2000:])
    assert "endless WER" in r.stdout and "GATE: FAIL" in r.stdout
