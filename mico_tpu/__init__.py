"""MiCo-TPU: a TPU-native omni-modal pretraining & inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
invictus717/MiCo (omni-modal contrastive pretraining: one shared ViT
encoder for image/video/audio/depth, a BERT cross-attention interface
branch for retrieval/ITM/captioning/QA).

Layout:
    ops/         fused numerics: packed/flash attention (Pallas), fbank,
                 torch-semantics resize, fp32-stat norms
    models/      EVA ViT, BERT interface, MiCo assembly, Swin/VideoSwin,
                 CLIP ViT + text tower, BEATs/AST, ModifiedResNet
    generation   fixed-shape scan decoding (greedy/top-k/beam/QA/SCST),
                 KV-cached by default
    text/        WordPiece + CLIP byte-BPE tokenizers, HF adapter
    media/       host decode (C++ libav audio+video) + fused processors
    data/        datasets, mappers, samplers, MetaLoader, prefetch
    parallel/    mesh, dp/tp/sp sharding rules, ZeRO-1, pipeline parallel,
                 collectives
    train/       objectives (ITC/ITM/CAP/QA, VAST-27M), optimizer,
                 schedules, train step, checkpoints (npz/orbax)
    evaluation/  retrieval (+ITM rerank), captioning, VQA metrics
    serve        streaming embedding pipeline
    tools/       corpus tooling, parity harness
    utils/       config system, logging, profiling, pretrained registry
"""

__version__ = "0.1.0"

from mico_tpu import config as config  # noqa: F401
