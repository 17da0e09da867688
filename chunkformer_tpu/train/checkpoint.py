"""Checkpoint save/load/resume + averaging.

TPU-native counterpart of the reference checkpointing
(reference: chunkformer/utils/checkpoint.py:26-112, bin/average_model.py:55-115):
orbax for the param/opt-state pytrees, plus the same `tag.yaml` sidecar
(epoch / step / lrs / loss_dict) driving resume, and best-N / last-N averaging.
The engine-specific save paths (DeepSpeed zero->fp32, FSDP FULL_STATE_DICT,
train_utils.py:608-634) collapse into one code path: orbax handles sharded
arrays natively.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import yaml


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(model_dir: str, tag: str, params, opt_state=None,
                    info_dict: Optional[Dict[str, Any]] = None) -> str:
    """Write `<dir>/<tag>/` pytree + `<tag>.yaml` sidecar
    (reference checkpoint.py:57-89)."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(model_dir, tag))
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    _ckptr().save(path, jax.tree.map(np.asarray, tree), force=True)
    info = dict(info_dict or {})
    info["tag"] = tag
    with open(os.path.join(model_dir, f"{tag}.yaml"), "w") as f:
        yaml.safe_dump(info, f)
    return path


def load_checkpoint(model_dir: str, tag: str):
    """Returns (params, opt_state|None, info_dict) (reference checkpoint.py:26-54)."""
    path = os.path.abspath(os.path.join(model_dir, tag))
    tree = _ckptr().restore(path)
    info = {}
    side = os.path.join(model_dir, f"{tag}.yaml")
    if os.path.exists(side):
        with open(side) as f:
            info = yaml.safe_load(f) or {}
    return tree["params"], tree.get("opt_state"), info


def list_checkpoints(model_dir: str) -> List[Dict[str, Any]]:
    """All tags with sidecar metadata, sorted by step."""
    out = []
    for side in glob.glob(os.path.join(model_dir, "*.yaml")):
        tag = os.path.splitext(os.path.basename(side))[0]
        if tag == "train":  # merged config dump, not a checkpoint
            continue
        if not os.path.isdir(os.path.join(model_dir, tag)):
            continue
        with open(side) as f:
            info = yaml.safe_load(f) or {}
        info.setdefault("tag", tag)
        out.append(info)
    out.sort(key=lambda d: d.get("step", 0))
    return out


def average_checkpoints(model_dir: str, num: int = 5, mode: str = "best",
                        min_step: int = 0) -> Any:
    """Average best-N (by cv loss) or last-N checkpoints
    (reference bin/average_model.py:55-115). Returns the averaged params."""
    ckpts = [c for c in list_checkpoints(model_dir) if c.get("step", 0) >= min_step]
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints in {model_dir}")
    if mode == "best":
        scored = [c for c in ckpts if "cv_loss" in c]
        scored.sort(key=lambda d: d["cv_loss"])
        chosen = scored[:num] if scored else ckpts[-num:]
    else:
        chosen = ckpts[-num:]
    acc = None
    for c in chosen:
        params, _, _ = load_checkpoint(model_dir, c["tag"])
        params = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        acc = params if acc is None else jax.tree.map(np.add, acc, params)
    n = len(chosen)
    return jax.tree.map(lambda x: (x / n).astype(np.float32), acc)


def load_trained_modules(params, init_dir: str, init_tag: str,
                         module_patterns: List[str]):
    """Partial init from a pretrained model (reference checkpoint.py:92-112,
    --enc_init/--enc_init_mods): copy leaves whose path matches any regex."""
    src, _, _ = load_checkpoint(init_dir, init_tag)
    pats = [re.compile(p) for p in module_patterns]

    flat_src = dict(jax.tree_util.tree_flatten_with_path(src)[0])

    def merge(path, leaf):
        key = jax.tree_util.keystr(path)
        if any(p.search(key) for p in pats) and path in flat_src:
            s = flat_src[path]
            if s.shape == leaf.shape:
                return jax.numpy.asarray(s)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)
