"""Export <-> import roundtrips and transducer/classification model loading."""

import os

import jax
import numpy as np
import pytest
import yaml

from tests.helpers import TINY_MODEL_YAML, make_model_dir, make_reference_state_dict

SAMPLES = "/root/reference/samples/audios"


def test_export_import_roundtrip(tmp_path):
    """Our params -> reference state_dict -> our params must be identity."""
    from chunkformer_tpu.api import ChunkFormerModel
    from chunkformer_tpu.config import ChunkFormerConfig
    from chunkformer_tpu.convert import convert_checkpoint
    from chunkformer_tpu.export import export_model_dir, params_to_torch_state_dict
    from chunkformer_tpu.models.asr import init_asr_model

    cfg = ChunkFormerConfig.from_dict(TINY_MODEL_YAML)
    params = init_asr_model(jax.random.PRNGKey(0), cfg)
    sd = params_to_torch_state_dict(params, cfg)
    back = convert_checkpoint(sd, cfg)
    flat_a = dict(jax.tree_util.tree_leaves_with_path(params))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert set(map(str, flat_a)) == set(map(str, flat_b))
    for k, v in flat_a.items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_b[k]), atol=1e-6,
                                   err_msg=str(k))

    # full dir roundtrip through from_pretrained
    out = str(tmp_path / "export")
    table = {f"t{i}": i for i in range(cfg.vocab_size)}
    export_model_dir(out, TINY_MODEL_YAML, params, table)
    model = ChunkFormerModel.from_pretrained(out)
    assert model.config.vocab_size == cfg.vocab_size


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="sample audio not mounted")
def test_transducer_from_pretrained_decodes(tmp_path):
    import torch

    from chunkformer_tpu.api import ChunkFormerModel
    from chunkformer_tpu.config import ChunkFormerConfig

    yaml_dict = dict(TINY_MODEL_YAML)
    yaml_dict = {k: v for k, v in yaml_dict.items() if k not in ("decoder", "decoder_conf")}
    yaml_dict["model"] = "transducer"
    yaml_dict["predictor"] = "rnn"
    yaml_dict["predictor_conf"] = {"embed_size": 16, "output_size": 16,
                                   "hidden_size": 16, "num_layers": 1,
                                   "embed_dropout": 0.0}
    yaml_dict["joint_conf"] = {"join_dim": 16, "enc_output_size": 32,
                               "pred_output_size": 16}
    yaml_dict["model_conf"] = {"ctc_weight": 0.0, "transducer_weight": 1.0}

    d = str(tmp_path / "rnnt")
    os.makedirs(d)
    cfg = ChunkFormerConfig.from_dict(yaml_dict)
    with open(os.path.join(d, "config.yaml"), "w") as f:
        yaml.safe_dump(yaml_dict, f)
    sd = make_reference_state_dict(cfg)
    torch.save(sd, os.path.join(d, "pytorch_model.bin"))
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        for i in range(cfg.vocab_size):
            f.write(f"t{i} {i}\n")

    model = ChunkFormerModel.from_pretrained(d)
    assert model.is_transducer
    wav = os.path.join(SAMPLES, "audio_1.wav")
    endless = model.endless_decode(wav, chunk_size=8, left_context_size=16,
                                   right_context_size=16, total_batch_duration=20,
                                   return_timestamps=False)
    batch = model.batch_decode([wav], chunk_size=8, left_context_size=16,
                               right_context_size=16)[0]
    assert isinstance(endless, str) and isinstance(batch, str)
    assert endless == batch


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="sample audio not mounted")
def test_classification_from_pretrained(tmp_path):
    import json

    import torch

    from chunkformer_tpu.api import ChunkFormerModel
    from chunkformer_tpu.config import ChunkFormerConfig

    yaml_dict = {k: v for k, v in TINY_MODEL_YAML.items()
                 if k not in ("decoder", "decoder_conf", "ctc_conf")}
    yaml_dict["model"] = "classification"
    yaml_dict["classification_conf"] = {"tasks": {"gender": 2, "emotion": 4}}

    d = str(tmp_path / "cls")
    os.makedirs(d)
    cfg = ChunkFormerConfig.from_dict(yaml_dict)
    cfg.vocab_size = 32  # only used by helper shapes
    with open(os.path.join(d, "config.yaml"), "w") as f:
        yaml.safe_dump(yaml_dict, f)
    sd = make_reference_state_dict(cfg)
    sd = {k: v for k, v in sd.items() if not k.startswith("ctc.")}
    torch.save(sd, os.path.join(d, "pytorch_model.bin"))
    with open(os.path.join(d, "label_mapping.json"), "w") as f:
        json.dump({"gender": ["male", "female"],
                   "emotion": ["neu", "hap", "sad", "ang"]}, f)

    model = ChunkFormerModel.from_pretrained(d)
    assert model.is_classification
    preds = model.classify_audio(os.path.join(SAMPLES, "audio_1.wav"))
    assert set(preds) == {"gender", "emotion"}
    for task, p in preds.items():
        assert 0.0 <= p["prob"] <= 1.0
        assert isinstance(p["label"], str)
