"""MiCo-TPU: a TPU-native omni-modal pretraining & inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
invictus717/MiCo (omni-modal contrastive pretraining: one shared ViT
encoder for image/video/audio/depth, a BERT cross-attention interface
branch for retrieval/ITM/captioning/QA).

Layout:
    ops/       fused numerics: flash attention (Pallas), fbank, resize, norms
    models/    EVA ViT, BERT interface, MiCo assembly, aux encoders
    text/      WordPiece tokenizer
    media/     host-side decode + processors (image/video/audio)
    parallel/  mesh construction, sharding rules, collectives
    train/     objectives (ITC/ITM/CAP/QA), optimizer, schedules, loops
    utils/     config system, logging, registries
"""

__version__ = "0.1.0"

from mico_tpu import config as config  # noqa: F401
