"""ChunkFormer-TPU: TPU-native long-form speech transcription framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
ishine/chunkformer (masked-chunk Conformer ASR, ICASSP 2025): long-form
streaming decode with exact right context, masked batching, hybrid
CTC/AED/RNN-T models, and distributed training via jax.sharding.
"""

__version__ = "0.1.0"

import os as _os

if "JAX_PLATFORMS" in _os.environ:
    # Some environments install a site hook that pre-imports jax and pins a
    # tunneled TPU platform via jax.config — which silently overrides the
    # JAX_PLATFORMS env var. Re-apply the user's explicit choice here, while
    # no backend has been initialized yet (harmless no-op otherwise).
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # noqa: BLE001 — backend already initialized; keep it
        pass

from .config import ChunkFormerConfig, EncoderConfig  # noqa: F401
