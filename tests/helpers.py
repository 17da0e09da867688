"""Test helpers: synthesize reference-format torch checkpoints and model dirs."""

import os

import numpy as np
import yaml


def make_reference_state_dict(cfg, rng=None):
    """Random tensors with the reference state_dict names/shapes
    (reference module attribute names; see convert.py)."""
    import torch

    rng = rng or np.random.default_rng(0)
    enc = cfg.encoder_conf
    d, h = enc.output_size, enc.attention_heads
    dk = d // h
    lu = enc.linear_units
    k = enc.cnn_module_kernel
    v = cfg.vocab_size

    def t(*shape, scale=0.1):
        return torch.tensor(rng.normal(scale=scale, size=shape).astype(np.float32))

    sd = {}
    sd["encoder.global_cmvn.mean"] = t(enc.input_size)
    sd["encoder.global_cmvn.istd"] = torch.abs(t(enc.input_size)) + 0.5

    sd["encoder.embed.conv.0.weight"] = t(d, 1, 3, 3)
    sd["encoder.embed.conv.0.bias"] = t(d)
    for base in (2, 5):
        sd[f"encoder.embed.conv.{base}.weight"] = t(d, 1, 3, 3)
        sd[f"encoder.embed.conv.{base}.bias"] = t(d)
        sd[f"encoder.embed.conv.{base + 1}.weight"] = t(d, d, 1, 1)
        sd[f"encoder.embed.conv.{base + 1}.bias"] = t(d)
    freq = enc.input_size
    for _ in range(3):
        freq = (freq - 3) // 2 + 1
    sd["encoder.embed.out.weight"] = t(d, d * freq)
    sd["encoder.embed.out.bias"] = t(d)

    for i in range(enc.num_blocks):
        p = f"encoder.encoders.{i}."
        for name in ("linear_q", "linear_k", "linear_v", "linear_out"):
            sd[f"{p}self_attn.{name}.weight"] = t(d, d)
            sd[f"{p}self_attn.{name}.bias"] = t(d)
        sd[f"{p}self_attn.linear_pos.weight"] = t(d, d)
        sd[f"{p}self_attn.pos_bias_u"] = t(h, dk)
        sd[f"{p}self_attn.pos_bias_v"] = t(h, dk)
        for ff in ("feed_forward", "feed_forward_macaron"):
            sd[f"{p}{ff}.w_1.weight"] = t(lu, d)
            sd[f"{p}{ff}.w_1.bias"] = t(lu)
            sd[f"{p}{ff}.w_2.weight"] = t(d, lu)
            sd[f"{p}{ff}.w_2.bias"] = t(d)
        sd[f"{p}conv_module.pointwise_conv1.weight"] = t(2 * d, d, 1)
        sd[f"{p}conv_module.pointwise_conv1.bias"] = t(2 * d)
        sd[f"{p}conv_module.depthwise_conv.weight"] = t(d, 1, k)
        sd[f"{p}conv_module.depthwise_conv.bias"] = t(d)
        sd[f"{p}conv_module.norm.weight"] = t(d)
        sd[f"{p}conv_module.norm.bias"] = t(d)
        if enc.cnn_module_norm == "batch_norm":
            sd[f"{p}conv_module.norm.running_mean"] = t(d)
            sd[f"{p}conv_module.norm.running_var"] = torch.abs(t(d)) + 1.0
        sd[f"{p}conv_module.pointwise_conv2.weight"] = t(d, d, 1)
        sd[f"{p}conv_module.pointwise_conv2.bias"] = t(d)
        for norm in ("norm_ff", "norm_mha", "norm_ff_macaron", "norm_conv", "norm_final"):
            sd[f"{p}{norm}.weight"] = t(d)
            sd[f"{p}{norm}.bias"] = t(d)

    sd["encoder.after_norm.weight"] = t(d)
    sd["encoder.after_norm.bias"] = t(d)
    sd["ctc.ctc_lo.weight"] = t(v, d)
    sd["ctc.ctc_lo.bias"] = t(v)

    if cfg.predictor:
        pc = cfg.predictor_conf
        sd["predictor.embed.weight"] = t(v, pc.embed_size)
        for i in range(pc.num_layers):
            in_dim = pc.embed_size if i == 0 else pc.hidden_size
            sd[f"predictor.rnn.weight_ih_l{i}"] = t(4 * pc.hidden_size, in_dim)
            sd[f"predictor.rnn.weight_hh_l{i}"] = t(4 * pc.hidden_size, pc.hidden_size)
            sd[f"predictor.rnn.bias_ih_l{i}"] = t(4 * pc.hidden_size)
            sd[f"predictor.rnn.bias_hh_l{i}"] = t(4 * pc.hidden_size)
        sd["predictor.projection.weight"] = t(pc.output_size, pc.hidden_size)
        sd["predictor.projection.bias"] = t(pc.output_size)
        jc = cfg.joint_conf
        sd["joint.enc_ffn.weight"] = t(jc.join_dim, jc.enc_output_size)
        sd["joint.enc_ffn.bias"] = t(jc.join_dim)
        sd["joint.pred_ffn.weight"] = t(jc.join_dim, jc.pred_output_size)
        sd["joint.pred_ffn.bias"] = t(jc.join_dim)
        sd["joint.ffn_out.weight"] = t(v, jc.join_dim)
        sd["joint.ffn_out.bias"] = t(v)

    for task, n_classes in cfg.classification_conf.get("tasks", {}).items():
        sd[f"classification_heads.{task}.linear.weight"] = t(n_classes, d)
        sd[f"classification_heads.{task}.linear.bias"] = t(n_classes)

    if cfg.decoder:
        dec = cfg.decoder_conf
        if dec.decoder_type == "bitransformer":
            sides = [("left_decoder.", dec.num_blocks),
                     ("right_decoder.", dec.r_num_blocks)]
        else:
            # plain transformer: keys live directly under `decoder.`
            # (reference: utils/init_model.py:96, modules/decoder.py:35)
            sides = [("", dec.num_blocks)]
        for side, nb in sides:
            sp = f"decoder.{side}"
            sd[f"{sp}embed.0.weight"] = t(v, d)
            sd[f"{sp}after_norm.weight"] = t(d)
            sd[f"{sp}after_norm.bias"] = t(d)
            sd[f"{sp}output_layer.weight"] = t(v, d)
            sd[f"{sp}output_layer.bias"] = t(v)
            for i in range(nb):
                p = f"{sp}decoders.{i}."
                for attn in ("self_attn", "src_attn"):
                    for name in ("linear_q", "linear_k", "linear_v", "linear_out"):
                        sd[f"{p}{attn}.{name}.weight"] = t(d, d)
                        sd[f"{p}{attn}.{name}.bias"] = t(d)
                sd[f"{p}feed_forward.w_1.weight"] = t(dec.linear_units, d)
                sd[f"{p}feed_forward.w_1.bias"] = t(dec.linear_units)
                sd[f"{p}feed_forward.w_2.weight"] = t(d, dec.linear_units)
                sd[f"{p}feed_forward.w_2.bias"] = t(d)
                for norm in ("norm1", "norm2", "norm3"):
                    sd[f"{p}{norm}.weight"] = t(d)
                    sd[f"{p}{norm}.bias"] = t(d)
    return sd


TINY_MODEL_YAML = {
    "model": "asr_model",
    "encoder": "chunkformer",
    "encoder_conf": {
        "output_size": 32, "attention_heads": 2, "linear_units": 64,
        "num_blocks": 2, "cnn_module_kernel": 15, "cnn_module_norm": "layer_norm",
        "dynamic_conv": True, "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
        "attention_dropout_rate": 0.0,
    },
    "decoder": "bitransformer",
    "decoder_conf": {"attention_heads": 2, "linear_units": 64, "num_blocks": 1,
                     "r_num_blocks": 1, "dropout_rate": 0.0},
    "ctc_conf": {"ctc_blank_id": 0},
    "model_conf": {"ctc_weight": 0.3, "lsm_weight": 0.1, "reverse_weight": 0.3},
    "output_dim": 32,
    "dataset_conf": {"fbank_conf": {"num_mel_bins": 80, "frame_shift": 10,
                                    "frame_length": 25, "dither": 0.0}},
}


def make_model_dir(tmpdir, yaml_dict=None):
    """Write a reference-format export dir: config.yaml + pytorch_model.bin + vocab.txt."""
    import torch

    from chunkformer_tpu.config import ChunkFormerConfig

    yaml_dict = yaml_dict or TINY_MODEL_YAML
    cfg = ChunkFormerConfig.from_dict(yaml_dict)
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, "config.yaml"), "w") as f:
        yaml.safe_dump(yaml_dict, f)
    sd = make_reference_state_dict(cfg)
    torch.save(sd, os.path.join(tmpdir, "pytorch_model.bin"))
    symbols = ["<blank>", "<unk>"] + [f"tok{i}" for i in range(cfg.vocab_size - 3)] + ["<sos/eos>"]
    with open(os.path.join(tmpdir, "vocab.txt"), "w") as f:
        for i, s in enumerate(symbols):
            f.write(f"{s} {i}\n")
    return cfg
