"""Export trained models to reference-format directories.

Writes the layout `from_pretrained` consumes — and that the reference's own
loader consumes (reference: examples/asr/ctc/run.sh:206-271,
chunkformer_model.py:145-206): config.yaml + pytorch_model.bin + vocab.txt
[+ global_cmvn]. The reverse name mapping of convert.py turns our param
pytree back into a reference torch state_dict, so checkpoints trained here
load in the reference framework and vice versa.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import yaml

from .config import ChunkFormerConfig


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _set_linear(sd, prefix, p, transpose=True):
    w = _np(p["w"])
    sd[f"{prefix}.weight"] = w.T if transpose else w
    if "b" in p:
        sd[f"{prefix}.bias"] = _np(p["b"])


def _set_conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["w"])
    if "b" in p:
        sd[f"{prefix}.bias"] = _np(p["b"])


def _set_norm(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["scale"])
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])
    if "mean" in p:
        sd[f"{prefix}.running_mean"] = _np(p["mean"])
        sd[f"{prefix}.running_var"] = _np(p["var"])
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def params_to_torch_state_dict(params: Dict[str, Any],
                               cfg: ChunkFormerConfig) -> Dict[str, np.ndarray]:
    """Our pytree -> reference state_dict names (inverse of convert.py)."""
    enc = cfg.encoder_conf
    sd: Dict[str, np.ndarray] = {}
    ep = params["encoder"]

    if "cmvn" in ep:
        sd["encoder.global_cmvn.mean"] = _np(ep["cmvn"]["mean"])
        sd["encoder.global_cmvn.istd"] = _np(ep["cmvn"]["istd"])

    _set_conv(sd, "encoder.embed.conv.0", ep["embed"]["conv0"])
    for i, base in enumerate((2, 5), start=1):
        _set_conv(sd, f"encoder.embed.conv.{base}", ep["embed"][f"dw{i}"])
        _set_conv(sd, f"encoder.embed.conv.{base + 1}", ep["embed"][f"pw{i}"])
    _set_linear(sd, "encoder.embed.out", ep["embed"]["out"])

    for i in range(enc.num_blocks):
        layer = jax.tree.map(lambda x: x[i], ep["layers"])
        lp = f"encoder.encoders.{i}."
        sa = layer["self_attn"]
        _set_linear(sd, f"{lp}self_attn.linear_q", sa["q"])
        _set_linear(sd, f"{lp}self_attn.linear_k", sa["k"])
        _set_linear(sd, f"{lp}self_attn.linear_v", sa["v"])
        _set_linear(sd, f"{lp}self_attn.linear_out", sa["out"])
        _set_linear(sd, f"{lp}self_attn.linear_pos", sa["pos"])
        sd[f"{lp}self_attn.pos_bias_u"] = _np(sa["pos_bias_u"])
        sd[f"{lp}self_attn.pos_bias_v"] = _np(sa["pos_bias_v"])
        _set_linear(sd, f"{lp}feed_forward.w_1", layer["ff"]["w1"])
        _set_linear(sd, f"{lp}feed_forward.w_2", layer["ff"]["w2"])
        _set_norm(sd, f"{lp}norm_ff", layer["norm_ff"])
        _set_norm(sd, f"{lp}norm_mha", layer["norm_mha"])
        if "ff_macaron" in layer:
            _set_linear(sd, f"{lp}feed_forward_macaron.w_1", layer["ff_macaron"]["w1"])
            _set_linear(sd, f"{lp}feed_forward_macaron.w_2", layer["ff_macaron"]["w2"])
            _set_norm(sd, f"{lp}norm_ff_macaron", layer["norm_ff_macaron"])
        if "conv" in layer:
            _set_conv(sd, f"{lp}conv_module.pointwise_conv1", layer["conv"]["pw1"])
            _set_conv(sd, f"{lp}conv_module.depthwise_conv", layer["conv"]["dw"])
            _set_norm(sd, f"{lp}conv_module.norm", layer["conv"]["norm"])
            _set_conv(sd, f"{lp}conv_module.pointwise_conv2", layer["conv"]["pw2"])
            _set_norm(sd, f"{lp}norm_conv", layer["norm_conv"])
            _set_norm(sd, f"{lp}norm_final", layer["norm_final"])
    _set_norm(sd, "encoder.after_norm", ep["after_norm"])

    if "ctc" in params:
        _set_linear(sd, "ctc.ctc_lo", params["ctc"]["lo"])

    if "decoder" in params:
        dec = cfg.decoder_conf
        sides = [("left", "left_decoder.")]
        if "right" in params["decoder"]:
            sides.append(("right", "right_decoder."))
        for key, prefix in sides:
            side = params["decoder"][key]
            sp = f"decoder.{prefix}"
            sd[f"{sp}embed.0.weight"] = _np(side["embed"]["w"])
            _set_norm(sd, f"{sp}after_norm", side["after_norm"])
            if "output_layer" in side:
                _set_linear(sd, f"{sp}output_layer", side["output_layer"])
            n_layers = jax.tree.leaves(side["layers"])[0].shape[0]
            for i in range(n_layers):
                layer = jax.tree.map(lambda x: x[i], side["layers"])
                lp = f"{sp}decoders.{i}."
                for attn in ("self_attn", "src_attn"):
                    _set_linear(sd, f"{lp}{attn}.linear_q", layer[attn]["q"])
                    _set_linear(sd, f"{lp}{attn}.linear_k", layer[attn]["k"])
                    _set_linear(sd, f"{lp}{attn}.linear_v", layer[attn]["v"])
                    _set_linear(sd, f"{lp}{attn}.linear_out", layer[attn]["out"])
                _set_linear(sd, f"{lp}feed_forward.w_1", layer["ff"]["w1"])
                _set_linear(sd, f"{lp}feed_forward.w_2", layer["ff"]["w2"])
                for norm in ("norm1", "norm2", "norm3"):
                    _set_norm(sd, f"{lp}{norm}", layer[norm])

    if "predictor" in params:
        # RNN predictor (reference transducer/predictor.py:69-207)
        pp = params["predictor"]
        sd["predictor.embed.weight"] = _np(pp["embed"]["w"])
        if "projection" in pp:
            _set_linear(sd, "predictor.projection", pp["projection"])
        for i, lp_ in enumerate(pp.get("rnn", [])):
            for name in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                key = "w_" + name[-2:] if name.startswith("weight") else "b_" + name[-2:]
                sd[f"predictor.rnn.{name}_l{i}"] = _np(lp_[key])

    if "joint" in params:
        jp = params["joint"]
        if "enc_ffn" in jp:
            _set_linear(sd, "joint.enc_ffn", jp["enc_ffn"])
            _set_linear(sd, "joint.pred_ffn", jp["pred_ffn"])
        if "post_ffn" in jp:
            _set_linear(sd, "joint.post_ffn", jp["post_ffn"])
        if "ffn_out" in jp:
            _set_linear(sd, "joint.ffn_out", jp["ffn_out"])
        if "blank_pred" in jp:
            _set_linear(sd, "joint.blank_pred.2", jp["blank_pred"])
            _set_linear(sd, "joint.token_pred.2", jp["token_pred"])

    if "simple_am_proj" in params:
        # k2 simple-joint projections (transducer/transducer.py:80-84)
        _set_linear(sd, "simple_am_proj", params["simple_am_proj"])
        _set_linear(sd, "simple_lm_proj", params["simple_lm_proj"])

    if "heads" in params:
        for task, head in params["heads"].items():
            _set_linear(sd, f"classification_heads.{task}.linear", head["linear"])
    return sd


def export_model_dir(
    out_dir: str,
    config_dict: Dict[str, Any],
    params: Dict[str, Any],
    symbol_table: Optional[Dict[str, int]] = None,
    label_mapping: Optional[Dict] = None,
) -> str:
    """Write a reference-format export directory."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    cfg = ChunkFormerConfig.from_dict(config_dict)
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(config_dict, f)
    sd = params_to_torch_state_dict(params, cfg)
    torch.save({k: torch.tensor(v) for k, v in sd.items()},
               os.path.join(out_dir, "pytorch_model.bin"))
    if symbol_table:
        with open(os.path.join(out_dir, "vocab.txt"), "w", encoding="utf-8") as f:
            for sym, idx in sorted(symbol_table.items(), key=lambda kv: kv[1]):
                f.write(f"{sym} {idx}\n")
    if label_mapping:
        with open(os.path.join(out_dir, "label_mapping.json"), "w") as f:
            json.dump(label_mapping, f, ensure_ascii=False, indent=2)
    return out_dir
