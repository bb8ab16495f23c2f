"""OpenAI-CLIP Vision Transformer (alternate MiCo vision encoder).

Capability parity with reference model/clip/clip.py:236-327
(`VisionTransformer`): bias-free conv patch embed, class + positional
embeddings, ln_pre, quickgelu residual blocks (packed in-proj
MultiheadAttention), optional per-block zero-init adaptor MLPs
(clip.py:174-213), ln_post over all tokens (`return_all_features=True`, the
path MiCo uses) or CLS + projection, and `forward_audio` (pre-embedded
tokens, transformer only, clip.py:257-271).

TPU-first: patch conv as reshape+matmul; packed qkv stays one matmul; all
blocks run under one jit program. The torch converter accepts both module
state dicts (`conv1.weight`, `transformer.resblocks.N...`) and the
`visual.`-prefixed layout of the OpenAI jit archive
(model/mico.py:364-369 loads it via torch.jit)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.ops.layers import layer_norm, linear


@dataclass(frozen=True)
class ClipVitConfig:
    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    adaptor_layers: int = 0
    ln_eps: float = 1e-5

    @property
    def seq_len(self) -> int:
        return (self.input_resolution // self.patch_size) ** 2 + 1


CLIP_VIT_CONFIGS = {
    # reference model/mico.py load_clip_model variants
    "clip_vit_base_16": ClipVitConfig(),
    "clip_vit_large_14": ClipVitConfig(
        patch_size=14, width=1024, layers=24, heads=16, output_dim=768
    ),
}


def _quickgelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _block(p, x, heads, eps):
    b, n, c = x.shape
    hd = c // heads
    h = layer_norm(x, p["ln1_scale"], p["ln1_bias"], eps)
    # torch in_proj emits [q | k | v] column groups — exactly the packed
    # layout, so the fused qkv tensor feeds the Pallas packed attention
    # kernel directly on TPU (identical-math XLA reference elsewhere /
    # fp32; same hot path as the EVA tower, ops/flash_attention.py)
    from mico_tpu.ops.flash_attention import packed_qkv_self_attention

    qkv = linear(h, p["qkv_w"], p["qkv_b"])              # (b, n, 3c)
    o = packed_qkv_self_attention(qkv, heads, float(hd) ** -0.5)
    x = x + linear(o, p["proj_w"], p["proj_b"])

    h = layer_norm(x, p["ln2_scale"], p["ln2_bias"], eps)
    mlp = linear(_quickgelu(linear(h, p["fc_w"], p["fc_b"])), p["cproj_w"],
                 p["cproj_b"])
    if "ada_fc_w" in p:
        ah = layer_norm(x, p["ada_ln_scale"], p["ada_ln_bias"], eps)
        ada = linear(
            _quickgelu(linear(ah, p["ada_fc_w"], p["ada_fc_b"])),
            p["ada_cproj_w"], p["ada_cproj_b"],
        )
        return x + mlp + p["ada_gamma"].astype(x.dtype) * ada
    return x + mlp


def clip_vit_forward(
    params: Dict, cfg: ClipVitConfig, pixels: jnp.ndarray,
    return_all_features: bool = True, compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(B, 3, H, W) → (B, N+1, width) all-token LN output, or (B, output_dim)
    CLS projection when return_all_features=False (clip.py:274-295)."""
    x = pixels.astype(compute_dtype)
    b = x.shape[0]
    p, g = cfg.patch_size, cfg.input_resolution // cfg.patch_size
    x = x.reshape(b, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, g * g, -1)
    x = linear(x, params["patch_w"], None)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(x.dtype)
    x = layer_norm(x, params["ln_pre_scale"], params["ln_pre_bias"], cfg.ln_eps)
    for lp in params["blocks"]:
        x = _block(lp, x, cfg.heads, cfg.ln_eps)
    if return_all_features:
        return layer_norm(
            x, params["ln_post_scale"], params["ln_post_bias"], cfg.ln_eps
        )
    cls_out = layer_norm(
        x[:, 0], params["ln_post_scale"], params["ln_post_bias"], cfg.ln_eps
    )
    return linear(cls_out, params["proj"], None)


def clip_vit_forward_audio(
    params: Dict, cfg: ClipVitConfig, tokens: jnp.ndarray,
    return_all_features: bool = True, compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Pre-embedded tokens through the transformer only (clip.py:257-271)."""
    x = tokens.astype(compute_dtype)
    for lp in params["blocks"]:
        x = _block(lp, x, cfg.heads, cfg.ln_eps)
    if return_all_features:
        return layer_norm(
            x, params["ln_post_scale"], params["ln_post_bias"], cfg.ln_eps
        )
    cls_out = layer_norm(
        x[:, 0], params["ln_post_scale"], params["ln_post_bias"], cfg.ln_eps
    )
    return linear(cls_out, params["proj"], None)


def init_clip_vit(key, cfg: ClipVitConfig) -> Dict:
    w = cfg.width
    scale = w**-0.5
    ks = jax.random.split(key, cfg.layers + 3)
    blocks = []
    for i in range(cfg.layers):
        k = jax.random.split(ks[i], 5)
        lp = {
            "ln1_scale": jnp.ones((w,)), "ln1_bias": jnp.zeros((w,)),
            "qkv_w": jax.random.normal(k[0], (w, 3 * w)) * 0.02,
            "qkv_b": jnp.zeros((3 * w,)),
            "proj_w": jax.random.normal(k[1], (w, w)) * 0.02,
            "proj_b": jnp.zeros((w,)),
            "ln2_scale": jnp.ones((w,)), "ln2_bias": jnp.zeros((w,)),
            "fc_w": jax.random.normal(k[2], (w, 4 * w)) * 0.02,
            "fc_b": jnp.zeros((4 * w,)),
            "cproj_w": jax.random.normal(k[3], (4 * w, w)) * 0.02,
            "cproj_b": jnp.zeros((w,)),
        }
        if i >= cfg.layers - cfg.adaptor_layers:
            lp.update({
                "ada_ln_scale": jnp.ones((w,)), "ada_ln_bias": jnp.zeros((w,)),
                "ada_fc_w": jax.random.normal(k[4], (w, w // 4)) * 0.02,
                "ada_fc_b": jnp.zeros((w // 4,)),
                "ada_cproj_w": jax.random.normal(k[4], (w // 4, w)) * 0.02,
                "ada_cproj_b": jnp.zeros((w,)),
                "ada_gamma": jnp.zeros((w,)),
            })
        blocks.append(lp)
    return {
        "patch_w": jax.random.normal(ks[-3], (3 * cfg.patch_size**2, w))
        * scale,
        "class_embedding": jax.random.normal(ks[-2], (w,)) * scale,
        "positional_embedding": jax.random.normal(ks[-1], (cfg.seq_len, w))
        * scale,
        "ln_pre_scale": jnp.ones((w,)), "ln_pre_bias": jnp.zeros((w,)),
        "blocks": blocks,
        "ln_post_scale": jnp.ones((w,)), "ln_post_bias": jnp.zeros((w,)),
        "proj": jax.random.normal(ks[-1], (w, cfg.output_dim)) * scale,
    }


def clip_vit_from_torch(sd: Dict, cfg: ClipVitConfig) -> Dict:
    """Accepts `visual.`-prefixed (OpenAI archive) or bare module keys."""
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}
    g = lambda k: np.asarray(sd[k])
    conv = g("conv1.weight")               # (W, 3, p, p)
    blocks = []
    for i in range(cfg.layers):
        pfx = f"transformer.resblocks.{i}."
        lp = {
            "ln1_scale": g(pfx + "ln_1.weight"), "ln1_bias": g(pfx + "ln_1.bias"),
            "qkv_w": g(pfx + "attn.in_proj_weight").T,
            "qkv_b": g(pfx + "attn.in_proj_bias"),
            "proj_w": g(pfx + "attn.out_proj.weight").T,
            "proj_b": g(pfx + "attn.out_proj.bias"),
            "ln2_scale": g(pfx + "ln_2.weight"), "ln2_bias": g(pfx + "ln_2.bias"),
            "fc_w": g(pfx + "mlp.c_fc.weight").T, "fc_b": g(pfx + "mlp.c_fc.bias"),
            "cproj_w": g(pfx + "mlp.c_proj.weight").T,
            "cproj_b": g(pfx + "mlp.c_proj.bias"),
        }
        if pfx + "ada_gamma" in sd:
            lp.update({
                "ada_ln_scale": g(pfx + "ada_ln_2.weight"),
                "ada_ln_bias": g(pfx + "ada_ln_2.bias"),
                "ada_fc_w": g(pfx + "ada_mlp.c_fc.weight").T,
                "ada_fc_b": g(pfx + "ada_mlp.c_fc.bias"),
                "ada_cproj_w": g(pfx + "ada_mlp.c_proj.weight").T,
                "ada_cproj_b": g(pfx + "ada_mlp.c_proj.bias"),
                "ada_gamma": g(pfx + "ada_gamma"),
            })
        blocks.append(lp)
    return jax.tree.map(jnp.asarray, {
        "patch_w": conv.reshape(conv.shape[0], -1).T,
        "class_embedding": g("class_embedding"),
        "positional_embedding": g("positional_embedding"),
        "ln_pre_scale": g("ln_pre.weight"), "ln_pre_bias": g("ln_pre.bias"),
        "blocks": blocks,
        "ln_post_scale": g("ln_post.weight"), "ln_post_bias": g("ln_post.bias"),
        "proj": g("proj"),
    })


def clip_vit_config_from_state_dict(sd: Dict, resolution: int = None) -> ClipVitConfig:
    """Infer the ViT geometry from an OpenAI CLIP state dict the way the
    reference does (model/clip/clip.py:499-520 build_model: width from
    conv1, depth from in_proj count, patch from the conv kernel)."""
    pfx = "visual." if any(k.startswith("visual.") for k in sd) else ""
    conv = sd[pfx + "conv1.weight"]
    layers = len([
        k for k in sd
        if k.startswith(pfx + "transformer.") and k.endswith(".attn.in_proj_weight")
    ])
    width = int(conv.shape[0])
    patch = int(conv.shape[-1])
    grid = round((sd[pfx + "positional_embedding"].shape[0] - 1) ** 0.5)
    return ClipVitConfig(
        input_resolution=resolution or grid * patch,
        patch_size=patch,
        width=width,
        layers=layers,
        heads=width // 64,
        output_dim=int(np.asarray(sd[pfx + "proj"]).shape[1]),
    )


def load_openai_clip(path: str, resolution: int = None,
                     adaptor_layers: int = 0):
    """Load an OpenAI CLIP weight archive — torch.jit archive or plain
    state-dict .pt (the reference branches the same way,
    model/mico.py:361-369) — infer the config, resize the visual pos-embed
    to `resolution`, convert. → (params, ClipVitConfig)."""
    import dataclasses

    import torch

    try:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    sd = {k: np.asarray(v.cpu() if hasattr(v, "cpu") else v)
          for k, v in sd.items()}
    cfg = clip_vit_config_from_state_dict(sd, resolution)
    cfg = dataclasses.replace(cfg, adaptor_layers=adaptor_layers)

    pfx = "visual." if any(k.startswith("visual.") for k in sd) else ""
    pos = sd[pfx + "positional_embedding"]
    grid = cfg.input_resolution // cfg.patch_size
    src_grid = round((pos.shape[0] - 1) ** 0.5)
    if src_grid != grid:
        # bilinear pos-embed resize, CLS preserved (reference
        # model/clip/clip.py:507-520)
        from mico_tpu.ops.interpolate import interp_bilinear_2d

        body = pos[1:].reshape(src_grid, src_grid, -1).transpose(2, 0, 1)
        body = np.asarray(
            interp_bilinear_2d(
                jnp.asarray(body)[None], (grid, grid), align_corners=False
            )
        )[0]
        body = body.transpose(1, 2, 0).reshape(grid * grid, -1)
        sd[pfx + "positional_embedding"] = np.concatenate([pos[:1], body])
    return clip_vit_from_torch(sd, cfg), cfg
