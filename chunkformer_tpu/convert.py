"""Convert reference torch checkpoints (pytorch_model.bin) to JAX param pytrees.

The mapping follows the reference module attribute names
(reference: chunkformer/modules/encoder.py, attention.py, convolution.py,
subsampling.py, ctc.py, decoder.py) so published `khanhld/chunkformer-*`
checkpoints load directly. Linear weights are transposed to [in, out]; conv
weights keep torch layouts (OIHW / OIW), which our conv wrappers consume
directly.

torch is used only as a host-side .bin reader; nothing torch touches the
device path.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .config import ChunkFormerConfig


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Dict[str, Any], prefix: str, transpose: bool = True) -> Dict[str, np.ndarray]:
    w = _t(sd[f"{prefix}.weight"])
    p = {"w": w.T if transpose else w}
    if f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _conv(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    p = {"w": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _norm(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    p = {"scale": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    if f"{prefix}.running_mean" in sd:
        p["mean"] = _t(sd[f"{prefix}.running_mean"])
        p["var"] = _t(sd[f"{prefix}.running_var"])
    return p


def convert_encoder(sd: Dict[str, Any], cfg: ChunkFormerConfig,
                    prefix: str = "encoder.") -> Dict[str, Any]:
    enc = cfg.encoder_conf
    p: Dict[str, Any] = {}

    if f"{prefix}global_cmvn.mean" in sd:
        p["cmvn"] = {"mean": _t(sd[f"{prefix}global_cmvn.mean"]),
                     "istd": _t(sd[f"{prefix}global_cmvn.istd"])}

    # subsampling conv stack (reference subsampling.py:69-112; Sequential
    # indices: 0 conv0, 2 dw1, 3 pw1, 5 dw2, 6 pw2)
    embed = {"conv0": _conv(sd, f"{prefix}embed.conv.0")}
    for i, base in enumerate((2, 5), start=1):
        embed[f"dw{i}"] = _conv(sd, f"{prefix}embed.conv.{base}")
        embed[f"pw{i}"] = _conv(sd, f"{prefix}embed.conv.{base + 1}")
    embed["out"] = _linear(sd, f"{prefix}embed.out")
    p["embed"] = embed

    layers = []
    for i in range(enc.num_blocks):
        lp = f"{prefix}encoders.{i}."
        layer: Dict[str, Any] = {
            "self_attn": {
                "q": _linear(sd, f"{lp}self_attn.linear_q"),
                "k": _linear(sd, f"{lp}self_attn.linear_k"),
                "v": _linear(sd, f"{lp}self_attn.linear_v"),
                "out": _linear(sd, f"{lp}self_attn.linear_out"),
                "pos": _linear(sd, f"{lp}self_attn.linear_pos"),
                "pos_bias_u": _t(sd[f"{lp}self_attn.pos_bias_u"]),
                "pos_bias_v": _t(sd[f"{lp}self_attn.pos_bias_v"]),
            },
            "ff": {"w1": _linear(sd, f"{lp}feed_forward.w_1"),
                   "w2": _linear(sd, f"{lp}feed_forward.w_2")},
            "norm_ff": _norm(sd, f"{lp}norm_ff"),
            "norm_mha": _norm(sd, f"{lp}norm_mha"),
        }
        if enc.macaron_style:
            layer["ff_macaron"] = {"w1": _linear(sd, f"{lp}feed_forward_macaron.w_1"),
                                   "w2": _linear(sd, f"{lp}feed_forward_macaron.w_2")}
            layer["norm_ff_macaron"] = _norm(sd, f"{lp}norm_ff_macaron")
        if enc.use_cnn_module:
            layer["conv"] = {
                "pw1": _conv(sd, f"{lp}conv_module.pointwise_conv1"),
                "dw": _conv(sd, f"{lp}conv_module.depthwise_conv"),
                "norm": _norm(sd, f"{lp}conv_module.norm"),
                "pw2": _conv(sd, f"{lp}conv_module.pointwise_conv2"),
            }
            layer["norm_conv"] = _norm(sd, f"{lp}norm_conv")
            layer["norm_final"] = _norm(sd, f"{lp}norm_final")
        layers.append(layer)

    import jax

    p["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    p["after_norm"] = _norm(sd, f"{prefix}after_norm")
    return p


def convert_ctc(sd: Dict[str, Any], prefix: str = "ctc.") -> Dict[str, Any]:
    return {"lo": _linear(sd, f"{prefix}ctc_lo")}


def convert_decoder(sd: Dict[str, Any], cfg: ChunkFormerConfig,
                    prefix: str = "decoder.") -> Dict[str, Any]:
    """Convert the AED (bi)transformer decoder (reference decoder.py:35-334)."""
    dec = cfg.decoder_conf
    assert dec is not None

    def one_side(side_prefix: str, num_blocks: int) -> Dict[str, Any]:
        p: Dict[str, Any] = {
            "embed": {"w": _t(sd[f"{side_prefix}embed.0.weight"])},
            "after_norm": _norm(sd, f"{side_prefix}after_norm"),
        }
        if f"{side_prefix}output_layer.weight" in sd:
            p["output_layer"] = _linear(sd, f"{side_prefix}output_layer")
        layers = []
        for i in range(num_blocks):
            lp = f"{side_prefix}decoders.{i}."
            layer = {
                "self_attn": {
                    "q": _linear(sd, f"{lp}self_attn.linear_q"),
                    "k": _linear(sd, f"{lp}self_attn.linear_k"),
                    "v": _linear(sd, f"{lp}self_attn.linear_v"),
                    "out": _linear(sd, f"{lp}self_attn.linear_out"),
                },
                "src_attn": {
                    "q": _linear(sd, f"{lp}src_attn.linear_q"),
                    "k": _linear(sd, f"{lp}src_attn.linear_k"),
                    "v": _linear(sd, f"{lp}src_attn.linear_v"),
                    "out": _linear(sd, f"{lp}src_attn.linear_out"),
                },
                "ff": {"w1": _linear(sd, f"{lp}feed_forward.w_1"),
                       "w2": _linear(sd, f"{lp}feed_forward.w_2")},
                "norm1": _norm(sd, f"{lp}norm1"),
                "norm2": _norm(sd, f"{lp}norm2"),
                "norm3": _norm(sd, f"{lp}norm3"),
            }
            layers.append(layer)
        import jax

        p["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *layers)
        return p

    if dec.decoder_type == "bitransformer":
        out = {"left": one_side(f"{prefix}left_decoder.", dec.num_blocks)}
        # r_num_blocks == 0 is a valid reference config (decoder.py:335-383
        # with no right-to-left layers); init_decoder omits "right" then too
        if dec.r_num_blocks > 0:
            out["right"] = one_side(f"{prefix}right_decoder.", dec.r_num_blocks)
        return out
    return {"left": one_side(prefix, dec.num_blocks)}


def convert_predictor(sd: Dict[str, Any], cfg: ChunkFormerConfig,
                      prefix: str = "predictor.") -> Dict[str, Any]:
    """RNN predictor (reference: transducer/predictor.py:69-207)."""
    pc = cfg.predictor_conf
    p: Dict[str, Any] = {
        "embed": {"w": _t(sd[f"{prefix}embed.weight"])},
        "projection": _linear(sd, f"{prefix}projection"),
        "rnn": [],
    }
    for i in range(pc.num_layers):
        p["rnn"].append({
            "w_ih": _t(sd[f"{prefix}rnn.weight_ih_l{i}"]),
            "w_hh": _t(sd[f"{prefix}rnn.weight_hh_l{i}"]),
            "b_ih": _t(sd[f"{prefix}rnn.bias_ih_l{i}"]),
            "b_hh": _t(sd[f"{prefix}rnn.bias_hh_l{i}"]),
        })
    return p


def convert_joint(sd: Dict[str, Any], prefix: str = "joint.") -> Dict[str, Any]:
    """Transducer joint (reference: transducer/joint.py:9-68)."""
    p: Dict[str, Any] = {}
    if f"{prefix}enc_ffn.weight" in sd:
        p["enc_ffn"] = _linear(sd, f"{prefix}enc_ffn")
        p["pred_ffn"] = _linear(sd, f"{prefix}pred_ffn")
    if f"{prefix}post_ffn.weight" in sd:
        p["post_ffn"] = _linear(sd, f"{prefix}post_ffn")
    if f"{prefix}ffn_out.weight" in sd:
        p["ffn_out"] = _linear(sd, f"{prefix}ffn_out")
    if f"{prefix}blank_pred.2.weight" in sd:
        p["blank_pred"] = _linear(sd, f"{prefix}blank_pred.2")
        p["token_pred"] = _linear(sd, f"{prefix}token_pred.2")
    return p


def convert_classification_heads(sd: Dict[str, Any]) -> Dict[str, Any]:
    """classification_heads.<task>.linear (classification_model.py:87-100)."""
    heads: Dict[str, Any] = {}
    for key in sd:
        if key.startswith("classification_heads.") and key.endswith(".linear.weight"):
            task = key.split(".")[1]
            heads[task] = {"linear": _linear(sd, f"classification_heads.{task}.linear")}
    return heads


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .bin/.pt checkpoint into numpy arrays (host-side only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def convert_checkpoint(sd: Dict[str, Any], cfg: ChunkFormerConfig) -> Dict[str, Any]:
    """Full model conversion: encoder + ctc + (decoder) [+ transducer parts]."""
    params: Dict[str, Any] = {"encoder": convert_encoder(sd, cfg)}
    if any(k.startswith("ctc.") for k in sd):
        params["ctc"] = convert_ctc(sd)
    if cfg.decoder and any(k.startswith("decoder.") for k in sd):
        params["decoder"] = convert_decoder(sd, cfg)
    if any(k.startswith("predictor.") for k in sd):
        params["predictor"] = convert_predictor(sd, cfg)
        params["joint"] = convert_joint(sd)
        # k2 simple-joint projections (transducer/transducer.py:80-84)
        if "simple_am_proj.weight" in sd:
            params["simple_am_proj"] = _linear(sd, "simple_am_proj")
            params["simple_lm_proj"] = _linear(sd, "simple_lm_proj")
    if any(k.startswith("classification_heads.") for k in sd):
        params["heads"] = convert_classification_heads(sd)
    return params
