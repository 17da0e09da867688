"""ChunkFormer-TPU: TPU-native long-form speech transcription framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
ishine/chunkformer (masked-chunk Conformer ASR, ICASSP 2025): long-form
streaming decode with exact right context, masked batching, hybrid
CTC/AED/RNN-T models, and distributed training via jax.sharding.
"""

__version__ = "0.1.0"

from .config import ChunkFormerConfig, EncoderConfig  # noqa: F401
