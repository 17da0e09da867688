"""Device mesh and sharding rules.

TPU-native replacement for the reference's entire distributed stack — DDP,
DeepSpeed ZeRO, and FSDP engines (reference: chunkformer/utils/train_utils.py:
254-489, utils/fsdp_utils.py): one 2-D mesh ``(data, model)`` plus
PartitionSpec rules. GSPMD inserts all collectives:

- DP        = batch dim sharded over ``data`` (replaces DDP all-reduce)
- ZeRO-3    = parameters/optimizer state sharded over ``data``
  ("fsdp" mode; replaces DeepSpeed zero1-3 and torch FSDP wrapping)
- TP        = attention heads / FFN hidden sharded over ``model``
  (the reference has none — train_utils.py:242 TODO)

No communication layer exists to port: psum/all-gather/reduce-scatter are
emitted by XLA from the sharding annotations and ride ICI.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# (regex over param path, partition spec builder given leaf ndim)
# Layer-stacked leaves carry a leading n_layers axis; rules index from the end.
_TP_RULES = [
    # attention projections: qkv shard out-dim, out-proj shard in-dim
    (r"self_attn/(q|k|v)/w$", ("model", -1)),
    (r"self_attn/(q|k|v)/b$", ("model", -1)),
    (r"self_attn/out/w$", ("model", -2)),
    (r"(ff|ff_macaron)/w1/w$", ("model", -1)),
    (r"(ff|ff_macaron)/w1/b$", ("model", -1)),
    (r"(ff|ff_macaron)/w2/w$", ("model", -2)),
    (r"src_attn/(q|k|v)/w$", ("model", -1)),
    (r"src_attn/(q|k|v)/b$", ("model", -1)),
    (r"src_attn/out/w$", ("model", -2)),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_pspec(path: str, leaf, mesh: Mesh, mode: str = "dp") -> P:
    """PartitionSpec for one parameter.

    mode: "dp" (replicated params), "fsdp" (ZeRO: shard largest axis over
    data), "tp" (attention/FFN over model), "fsdp_tp" (both).
    """
    ndim = leaf.ndim
    spec: list = [None] * ndim
    model_n = mesh.shape.get("model", 1)
    data_n = mesh.shape.get("data", 1)

    if mode in ("tp", "fsdp_tp") and model_n > 1:
        for pat, (axis_name, dim) in _TP_RULES:
            if re.search(pat, path):
                d = dim % ndim
                if leaf.shape[d] % model_n == 0:
                    spec[d] = axis_name
                break

    if mode in ("fsdp", "fsdp_tp") and data_n > 1:
        # shard the largest still-unsharded axis over data (ZeRO-3 analogue);
        # leave small tensors replicated — sharding them costs more in
        # collectives/resharding than it saves in memory
        total = 1
        for d in range(ndim):
            total *= leaf.shape[d]
        if total >= 65536:
            order = sorted(range(ndim), key=lambda d: -leaf.shape[d])
            for d in order:
                if spec[d] is None and leaf.shape[d] % data_n == 0 \
                        and leaf.shape[d] >= data_n:
                    spec[d] = "data"
                    break
    return P(*spec)


def shard_params(params, mesh: Mesh, mode: str = "dp"):
    """Place a param pytree onto the mesh according to `mode`."""

    def place(path, leaf):
        spec = param_pspec(_path_str(path), leaf, mesh, mode)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh, mode: str = "dp"):
    """NamedSharding pytree (for jit in_shardings / orbax restore)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_pspec(_path_str(path), leaf, mesh, mode)),
        params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs: batch dim over data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
