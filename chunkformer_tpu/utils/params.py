"""Parameter tree utilities."""

from __future__ import annotations

import jax
import numpy as np


def random_params_like(init_fn, seed: int = 0, scale: float = 0.05):
    """Host-side random params with the structure/shapes of `init_fn(key)`.

    Avoids compiling the (slow) RNG init graph on device — useful for benches
    and compile checks where weight values don't matter.
    """
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda s: (rng.standard_normal(s.shape) * scale).astype(np.float32), shapes)


def count_params(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))


def tree_bytes(params) -> int:
    return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(params))
