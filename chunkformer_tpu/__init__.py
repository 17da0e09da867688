"""ChunkFormer-TPU: TPU-native long-form speech transcription framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
ishine/chunkformer (masked-chunk Conformer ASR, ICASSP 2025): long-form
streaming decode with exact right context, masked batching, hybrid
CTC/AED/RNN-T models, and distributed training via jax.sharding.
"""

__version__ = "0.1.0"

import os as _os

if "JAX_PLATFORMS" in _os.environ:
    # honor the env var even when a site hook pre-imported jax under another
    # platform (the env var is only read at first import)
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # noqa: BLE001
        pass

from .config import ChunkFormerConfig, EncoderConfig  # noqa: F401
