"""EVA/OpenAI-CLIP text tower and the two-tower CLIP assembly, TPU-native.

Capability parity with the reference `TextTransformer`
(model/evaclip/transformer.py:711-806: token embedding + learned positions,
pre-norm causal transformer, final LN, EOT-argmax pooling through a text
projection) and `CustomCLIP` (model/evaclip/model.py:272-314: visual tower +
text tower + learnable logit scale, normalized features). The per-model
text shapes mirror the eight JSONs under model/evaclip/model_configs/ (see
EVA_TEXT_CONFIGS / EVA_CLIP_EMBED_DIMS in mico_tpu.config... kept here to
avoid a config-module cycle).

TPU-first: one packed qkv matmul per block, fp32-stat LayerNorm, causal
bias folded as an additive (1, 1, L, L) mask, jit/scan-friendly static
shapes. MiCo itself deletes the text tower after loading
(model/mico.py:419); this module exists for full EVA-CLIP capability parity
(zero-shot retrieval with the released CLIP checkpoints).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.ops.attention import multi_head_attention
from mico_tpu.ops.layers import gelu, layer_norm, linear

NEG_INF = -1.0e9


@dataclass(frozen=True)
class ClipTextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    output_dim: int = 512
    ln_eps: float = 1e-5
    quick_gelu: bool = False    # OpenAI CLIP text towers use x*sigmoid(1.702x)

    @property
    def mlp_width(self) -> int:
        return 4 * self.width


# text_cfg of each reference JSON (model/evaclip/model_configs/*.json),
# keyed by config name; output_dim is the top-level embed_dim
EVA_TEXT_CONFIGS = {
    "EVA01-CLIP-B-16": ClipTextConfig(width=512, heads=8, layers=12,
                                      output_dim=512),
    "EVA01-CLIP-g-14": ClipTextConfig(width=768, heads=12, layers=12,
                                      output_dim=1024),
    "EVA01-CLIP-g-14-plus": ClipTextConfig(width=1024, heads=16, layers=24,
                                           output_dim=1024),
    "EVA02-CLIP-B-16": ClipTextConfig(width=512, heads=8, layers=12,
                                      output_dim=512),
    "EVA02-CLIP-L-14": ClipTextConfig(width=768, heads=12, layers=12,
                                      output_dim=768),
    "EVA02-CLIP-L-14-336": ClipTextConfig(width=768, heads=12, layers=12,
                                          output_dim=768),
    "EVA02-CLIP-bigE-14": ClipTextConfig(width=1024, heads=16, layers=24,
                                         output_dim=1024),
    "EVA02-CLIP-bigE-14-plus": ClipTextConfig(width=1280, heads=20, layers=32,
                                              output_dim=1024),
}


def _act(cfg: ClipTextConfig, x):
    if cfg.quick_gelu:
        return x * jax.nn.sigmoid(1.702 * x)
    return gelu(x)


def init_clip_text(key: jax.Array, cfg: ClipTextConfig) -> Dict:
    """Reference init scheme (transformer.py:756-770)."""
    w = cfg.width
    ks = jax.random.split(key, cfg.layers + 3)
    proj_std = (w**-0.5) * ((2 * cfg.layers) ** -0.5)
    fc_std = (2 * w) ** -0.5
    layers = []
    for li in range(cfg.layers):
        k = jax.random.split(ks[li], 4)
        layers.append({
            "qkv_w": jax.random.normal(k[0], (w, 3 * w)) * (w**-0.5),
            "qkv_b": jnp.zeros((3 * w,)),
            "proj_w": jax.random.normal(k[1], (w, w)) * proj_std,
            "proj_b": jnp.zeros((w,)),
            "ln1_w": jnp.ones((w,)), "ln1_b": jnp.zeros((w,)),
            "ln2_w": jnp.ones((w,)), "ln2_b": jnp.zeros((w,)),
            "fc_w": jax.random.normal(k[2], (w, cfg.mlp_width)) * fc_std,
            "fc_b": jnp.zeros((cfg.mlp_width,)),
            "out_w": jax.random.normal(k[3], (cfg.mlp_width, w)) * proj_std,
            "out_b": jnp.zeros((w,)),
        })
    return {
        "token_embedding": jax.random.normal(ks[-3], (cfg.vocab_size, w)) * 0.02,
        "positional_embedding": (
            jax.random.normal(ks[-2], (cfg.context_length, w)) * 0.01
        ),
        "ln_final_w": jnp.ones((w,)), "ln_final_b": jnp.zeros((w,)),
        "text_projection": (
            jax.random.normal(ks[-1], (w, cfg.output_dim)) * (w**-0.5)
        ),
        "layers": layers,
    }


def clip_text_forward(
    params: Dict,
    cfg: ClipTextConfig,
    token_ids: jnp.ndarray,            # (B, L) int; 0-padded after EOT
    return_all_features: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(B, L) ids → pooled (B, output_dim), or (B, L, width) token features.

    Pooling is the reference EOT-argmax rule: the EOT id is the largest id
    in the sequence, so argmax over ids finds it
    (transformer.py:800-804)."""
    b, l = token_ids.shape
    x = params["token_embedding"][token_ids].astype(compute_dtype)
    x = x + params["positional_embedding"][:l].astype(compute_dtype)

    causal = jnp.triu(jnp.full((l, l), NEG_INF, jnp.float32), k=1)
    bias = causal[None, None]
    nh = cfg.heads
    hd = cfg.width // nh
    for lp in params["layers"]:
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        qkv = linear(h, lp["qkv_w"], lp["qkv_b"])
        qkv = qkv.reshape(b, l, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        o = multi_head_attention(
            qkv[0], qkv[1], qkv[2], bias=bias, scale=hd**-0.5, impl="xla"
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, l, cfg.width)
        x = x + linear(o, lp["proj_w"], lp["proj_b"])
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        h = _act(cfg, linear(h, lp["fc_w"], lp["fc_b"]))
        x = x + linear(h, lp["out_w"], lp["out_b"])

    x = layer_norm(x, params["ln_final_w"], params["ln_final_b"], cfg.ln_eps)
    if return_all_features:
        return x
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return pooled @ params["text_projection"].astype(pooled.dtype)


def clip_text_from_torch(sd: Dict, cfg: ClipTextConfig, prefix: str = "") -> Dict:
    """Convert a reference TextTransformer state dict (keys like
    `text.transformer.resblocks.N.attn.in_proj_weight`); pass prefix='text.'
    for a CustomCLIP checkpoint, '' for a bare tower."""
    g = lambda k: np.asarray(sd[prefix + k])
    layers = []
    for i in range(cfg.layers):
        p = f"transformer.resblocks.{i}."
        layers.append({
            "qkv_w": g(p + "attn.in_proj_weight").T,
            "qkv_b": g(p + "attn.in_proj_bias"),
            "proj_w": g(p + "attn.out_proj.weight").T,
            "proj_b": g(p + "attn.out_proj.bias"),
            "ln1_w": g(p + "ln_1.weight"), "ln1_b": g(p + "ln_1.bias"),
            "ln2_w": g(p + "ln_2.weight"), "ln2_b": g(p + "ln_2.bias"),
            "fc_w": g(p + "mlp.c_fc.weight").T, "fc_b": g(p + "mlp.c_fc.bias"),
            "out_w": g(p + "mlp.c_proj.weight").T,
            "out_b": g(p + "mlp.c_proj.bias"),
        })
    params = {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "ln_final_w": g("ln_final.weight"), "ln_final_b": g("ln_final.bias"),
        "text_projection": g("text_projection"),
        "layers": layers,
    }
    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Two-tower CLIP assembly (CustomCLIP, model/evaclip/model.py:272-314)
# ---------------------------------------------------------------------------


def init_clip(key: jax.Array, vision_cfg, text_cfg: ClipTextConfig) -> Dict:
    from mico_tpu.models import eva_vit

    kv, kt = jax.random.split(key)
    return {
        "visual": eva_vit.init_eva_vit(kv, vision_cfg),
        "text": init_clip_text(kt, text_cfg),
        # ln(1/0.07), model.py:283
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }


def clip_encode_image(params, vision_cfg, pixels, normalize=True,
                      compute_dtype=jnp.float32):
    from mico_tpu.models import eva_vit

    feats = eva_vit.eva_vit_forward(
        params["visual"], vision_cfg, pixels, return_all_features=False,
        compute_dtype=compute_dtype,
    )
    # CLIP projection head width → embed_dim (eva_vit_model.py:544,654-659)
    head = params["visual"]["head"]
    feats = linear(feats, head["kernel"], head.get("bias"))
    if normalize:
        feats = feats / jnp.linalg.norm(
            feats.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(feats.dtype)
    return feats


def clip_encode_text(params, text_cfg, token_ids, normalize=True,
                     compute_dtype=jnp.float32):
    feats = clip_text_forward(
        params["text"], text_cfg, token_ids, compute_dtype=compute_dtype
    )
    if normalize:
        feats = feats / jnp.linalg.norm(
            feats.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(feats.dtype)
    return feats


def clip_forward(params, vision_cfg, text_cfg, pixels, token_ids,
                 compute_dtype=jnp.float32):
    """→ (image_features, text_features, exp(logit_scale))
    (model/evaclip/model.py:304-314)."""
    img = clip_encode_image(params, vision_cfg, pixels,
                            compute_dtype=compute_dtype)
    txt = clip_encode_text(params, text_cfg, token_ids,
                           compute_dtype=compute_dtype)
    return img, txt, jnp.exp(params["logit_scale"])


def build_zero_shot_classifier(
    params,
    text_cfg: ClipTextConfig,
    classnames,
    templates=("a photo of a {}.",),
    tokenizer=None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """CLIP zero-shot classifier weights: per class, embed every prompt
    template, average, normalize → (n_classes, embed_dim). Classify with
    `image_features @ W.T * exp(logit_scale)` (the standard open_clip
    zero-shot recipe the reference towers are used with)."""
    if tokenizer is None:
        from mico_tpu.text.bpe import ClipBpeTokenizer

        tokenizer = ClipBpeTokenizer()
    weights = []
    for name in classnames:
        prompts = [t.format(name) for t in templates]
        ids = jnp.asarray(tokenizer(prompts, text_cfg.context_length))
        f = clip_text_forward(
            params["text"], text_cfg, ids, compute_dtype=compute_dtype
        ).astype(jnp.float32)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        m = f.mean(axis=0)
        weights.append(m / jnp.linalg.norm(m))
    return jnp.stack(weights)


# ---------------------------------------------------------------------------
# Factory (model/evaclip/factory.py:211-360 create_model)
# ---------------------------------------------------------------------------


def create_model(name: str, key=None, image_size: int = None):
    """Resolve an EVA-CLIP config name to (vision_cfg, text_cfg, params).

    Mirrors the reference JSON registry + create_model: image_size override
    re-derives the vision grid (factory.py:250-251); params are freshly
    initialized when `key` is given, else None (load a checkpoint with
    `clip_from_torch`)."""
    from mico_tpu.config import EVA_VIT_CONFIGS

    if name not in EVA_VIT_CONFIGS:
        raise KeyError(
            f"unknown EVA-CLIP config {name!r}; have {sorted(EVA_VIT_CONFIGS)}"
        )
    vision_cfg = EVA_VIT_CONFIGS[name]
    if image_size is not None:
        vision_cfg = vision_cfg.with_image_size(image_size)
    text_cfg = EVA_TEXT_CONFIGS[name]
    params = None if key is None else init_clip(key, vision_cfg, text_cfg)
    return vision_cfg, text_cfg, params


def clip_from_torch(sd: Dict, vision_cfg, text_cfg: ClipTextConfig) -> Dict:
    """Convert a full CustomCLIP checkpoint (visual.* / text.* /
    logit_scale), resizing the visual pos-embed to the target grid
    (reference load_checkpoint + resize_evaclip_pos_embed,
    factory.py:110-129, utils.py:13-141)."""
    from mico_tpu.convert import eva_vit_from_torch, to_numpy

    sd = to_numpy(sd)
    return {
        "visual": eva_vit_from_torch(sd, vision_cfg, prefix="visual."),
        "text": clip_text_from_torch(sd, text_cfg, prefix="text."),
        "logit_scale": jnp.asarray(sd["logit_scale"], jnp.float32),
    }
