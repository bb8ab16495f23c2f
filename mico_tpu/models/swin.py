"""Swin Transformer family, TPU-native: 2D Swin (alternate MiCo vision/audio
encoder) and 3D VideoSwin (VAST vision encoder).

Capability parity:
  - 2D: reference model/swin.py:77-611 (WindowAttention w/ relative position
    bias, shifted windows with the 9-region mask, PatchMerging,
    `forward_features` token sequence, `encode_audio` 1→3 channel repeat,
    yacs defaults model/swin_config.py:49-91 + the swin-base yaml).
  - 3D: reference data/model/vision_encoders/videoswin/videoswin.py:100-457
    (3D windows (D,H,W), tri-axial relative position index, pad-to-window,
    window shrink when an axis is smaller than the window, lru-cached shift
    mask, PatchEmbed3D with always-pad-time-by-1, PatchMerging on H/W only).

TPU-first design: everything is static-shape — window partition is pure
reshape/transpose (free under XLA), the relative-position bias tables are
gathered with a host-precomputed static index, and the shifted-window mask
is a numpy constant folded into the program. Window attention batches as
(B·nW, heads, Nw, Nw) matmuls on the MXU; no data-dependent control flow.
Training regularizers (dropout + the linear stochastic-depth schedule,
reference model/swin.py:175-258 / videoswin.py:100-240) activate when a
train_rng is passed to the forward; without one every path is the exact
eval graph (golden-tested).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import lru_cache, reduce
from operator import mul
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.ops.layers import dropout, gelu, layer_norm, linear


def _drop_path(key, rate, x):
    """Stochastic depth over the leading (batch) dim, rank-agnostic
    (reference DropPath, videoswin.py:39-54 / timm): per-sample Bernoulli
    keep scaled by 1/keep. Identity when no rng (eval) or rate 0."""
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros_like(x))

# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SwinConfig:
    """2D Swin (reference model/swin_config.py defaults; base-224-22k yaml
    overrides embed_dim 128, depths [2,2,18,2], heads [4,8,16,32])."""

    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ape: bool = False
    patch_norm: bool = True
    ln_eps: float = 1e-5
    # train-time regularizers (reference model/swin_config.py:62-64 defaults;
    # stochastic-depth schedule linspace(0, rate, sum(depths)))
    drop_path_rate: float = 0.1
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def patches_resolution(self) -> Tuple[int, int]:
        return (self.img_size // self.patch_size, self.img_size // self.patch_size)


SWIN_CONFIGS = {
    # model/swin_base_patch4_window7_224_22k.yaml
    "swin_base_patch4_window7_224_22k": SwinConfig(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)
    ),
    "swin_tiny_patch4_window7_224": SwinConfig(),
}


@dataclass(frozen=True)
class VideoSwinConfig:
    """3D VideoSwin (reference videoswin.py:377-399 defaults = Swin-B K600)."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_norm: bool = True
    time_stride: int = 1
    ln_eps: float = 1e-5
    # train-time regularizers (reference videoswin.py:388-392 defaults)
    drop_path_rate: float = 0.2
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))


VIDEOSWIN_CONFIGS = {
    # VAST uses Swin-B with time_stride=1 (data/model/general_module.py:230-241)
    "videoswin_base": VideoSwinConfig(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)
    ),
}


# ---------------------------------------------------------------------------
# static precomputations (host numpy, folded as constants)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=64)
def relative_position_index(window: Tuple[int, ...]) -> np.ndarray:
    """Kaldi of Swin: pairwise relative-coordinate lookup into the bias table
    (2D: model/swin.py:104-115; 3D: videoswin.py:110-124). Returns (Nw, Nw)."""
    coords = np.stack(
        np.meshgrid(*[np.arange(w) for w in window], indexing="ij")
    ).reshape(len(window), -1)
    rel = coords[:, :, None] - coords[:, None, :]          # (d, Nw, Nw)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    strides = []
    s = 1
    for w in reversed(window):
        strides.append(s)
        s *= 2 * w - 1
    strides = list(reversed(strides))
    for i, w in enumerate(window):
        rel[:, :, i] += w - 1
        rel[:, :, i] *= strides[i]
    return rel.sum(-1)


@lru_cache(maxsize=64)
def shift_attn_mask(
    dims: Tuple[int, ...], window: Tuple[int, ...], shift: Tuple[int, ...]
) -> Optional[np.ndarray]:
    """9-region (2D) / 27-region (3D) shifted-window mask: -100 between
    tokens from different source regions (model/swin.py:222-242,
    videoswin.py:270-284). Returns (nW, Nw, Nw) or None when no shift."""
    if not any(shift):
        return None
    img = np.zeros(dims, np.int32)
    cnt = 0
    slices_per_axis = [
        (slice(0, -w), slice(-w, -s), slice(-s, None)) if s > 0 else (slice(None),)
        for w, s in zip(window, shift)
    ]

    def fill(idx, axis):
        nonlocal cnt
        if axis == len(dims):
            img[tuple(idx)] = cnt
            cnt += 1
            return
        for sl in slices_per_axis[axis]:
            fill(idx + [sl], axis + 1)

    fill([], 0)
    wins = _window_partition_np(img[None, ..., None], window)[..., 0]
    wins = wins.reshape(wins.shape[0], -1)                 # (nW, Nw)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition_np(x: np.ndarray, window):
    return np.asarray(_window_partition(jnp.asarray(x), window))


def _window_partition(x, window):
    """(B, *dims, C) → (B·nW, *window, C); dims divisible by window."""
    b = x.shape[0]
    c = x.shape[-1]
    dims = x.shape[1:-1]
    shape = [b]
    for d, w in zip(dims, window):
        shape += [d // w, w]
    x = x.reshape(*shape, c)
    # interleave: (B, n0, w0, n1, w1, ... C) → (B, n0, n1, ..., w0, w1, ..., C)
    nd = len(dims)
    perm = [0] + [1 + 2 * i for i in range(nd)] + [2 + 2 * i for i in range(nd)] + [2 * nd + 1]
    x = x.transpose(perm)
    return x.reshape(-1, *window, c)


def _window_reverse(wins, window, b, dims):
    c = wins.shape[-1]
    nd = len(dims)
    n = [d // w for d, w in zip(dims, window)]
    x = wins.reshape(b, *n, *window, c)
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    perm += [2 * nd + 1]
    x = x.transpose(perm)
    return x.reshape(b, *dims, c)


# ---------------------------------------------------------------------------
# core blocks (shared 2D/3D)
# ---------------------------------------------------------------------------


def _mlp(p, x, eps, rng=None, drop=0.0):
    """timm Mlp: fc1 → GELU → drop → fc2 → drop (reference swin.py:57-71 /
    videoswin.py:57-71)."""
    h = gelu(linear(x, p["fc1_w"], p["fc1_b"]))
    if rng is not None:
        k1, k2 = jax.random.split(rng)
        h = dropout(k1, drop, h)
        return dropout(k2, drop, linear(h, p["fc2_w"], p["fc2_b"]))
    return linear(h, p["fc2_w"], p["fc2_b"])


def _window_attention(p, x, window, num_heads, mask: Optional[np.ndarray],
                      rng=None, attn_drop=0.0, proj_drop=0.0):
    """x: (B_, Nw, C); mask: (nW, Nw, Nw) numpy or None."""
    b_, n, c = x.shape
    head_dim = c // num_heads
    qkv = linear(x, p["qkv_w"], p.get("qkv_b"))
    qkv = qkv.reshape(b_, n, 3, num_heads, head_dim).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * (head_dim**-0.5), qkv[1], qkv[2]
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k)

    idx = relative_position_index(tuple(window))
    bias = jnp.asarray(p["rel_bias_table"])[idx.reshape(-1)]
    bias = bias.reshape(n, n, num_heads).transpose(2, 0, 1)
    attn = attn + bias[None].astype(attn.dtype)

    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, num_heads, n, n)
        attn = attn + jnp.asarray(mask)[None, :, None].astype(attn.dtype)
        attn = attn.reshape(b_, num_heads, n, n)

    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    if rng is not None:
        ka, kp = jax.random.split(rng)
        # attention-probability dropout (reference WindowAttention.attn_drop)
        attn = dropout(ka, attn_drop, attn)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
    out = linear(out, p["proj_w"], p["proj_b"])
    if rng is not None:
        out = dropout(kp, proj_drop, out)
    return out


def _swin_block(p, x, dims, window, shift, num_heads, eps,
                rng=None, dp_rate=0.0, drop=0.0, attn_drop=0.0):
    """x: (B, *dims, C). Pads to window multiples (3D path; 2D is exact),
    rolls for the shift, window-attends, reverses."""
    b = x.shape[0]
    c = x.shape[-1]
    # shrink window/zero shift on axes not larger than the window
    # (2D: model/swin.py:206-210; 3D get_window_size, videoswin.py:85-98)
    window = tuple(min(w, d) for w, d in zip(window, dims))
    shift = tuple(0 if d <= w else s for s, w, d in zip(shift, window, dims))

    shortcut = x
    x = layer_norm(x, p["norm1_scale"], p["norm1_bias"], eps)

    padded = tuple(-(-d // w) * w for d, w in zip(dims, window))
    if padded != tuple(dims):
        pad = [(0, 0)] + [(0, pd - d) for pd, d in zip(padded, dims)] + [(0, 0)]
        x = jnp.pad(x, pad)
    if any(shift):
        x = jnp.roll(x, [-s for s in shift], axis=tuple(range(1, 1 + len(dims))))
    mask = shift_attn_mask(padded, window, shift)
    nw_tokens = reduce(mul, window)
    if rng is None:
        k_attn = k_dp1 = k_mlp = k_dp2 = None
    else:
        k_attn, k_dp1, k_mlp, k_dp2 = jax.random.split(rng, 4)
    wins = _window_partition(x, window).reshape(-1, nw_tokens, c)
    wins = _window_attention(p["attn"], wins, window, num_heads, mask,
                             rng=k_attn, attn_drop=attn_drop, proj_drop=drop)
    x = _window_reverse(wins.reshape(-1, *window, c), window, b, padded)
    if any(shift):
        x = jnp.roll(x, list(shift), axis=tuple(range(1, 1 + len(dims))))
    if padded != tuple(dims):
        x = x[tuple([slice(None)] + [slice(0, d) for d in dims])]

    # stochastic depth on both residual branches (reference swin.py:252-258)
    x = shortcut + _drop_path(k_dp1, dp_rate, x)
    h = layer_norm(x, p["norm2_scale"], p["norm2_bias"], eps)
    return x + _drop_path(
        k_dp2, dp_rate, _mlp(p["mlp"], h, eps, rng=k_mlp, drop=drop)
    )


def _patch_merging(p, x, eps):
    """(B, H, W, C) → (B, H/2, W/2, 2C); odd H/W padded (3D variant,
    videoswin.py:252-258; the 2D reference asserts evenness instead)."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = layer_norm(x, p["norm_scale"], p["norm_bias"], eps)
    return linear(x, p["reduction_w"], None)


# ---------------------------------------------------------------------------
# 2D Swin
# ---------------------------------------------------------------------------


def swin_forward_features(
    params: Dict, cfg: SwinConfig, pixels: jnp.ndarray,
    compute_dtype=jnp.float32, train_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(B, 3, H, W) → (B, L, num_features) final-LN token sequence
    (reference model/swin.py:588-606).

    train_rng activates the reference training regularizers: pos dropout,
    per-block attn/proj/MLP dropout, and the linear stochastic-depth
    schedule up to cfg.drop_path_rate (model/swin.py:520-536)."""
    x = pixels.astype(compute_dtype)
    b = x.shape[0]
    p, ph = cfg.patch_size, cfg.patches_resolution
    # conv k=p stride=p as patch-reshape + matmul (MXU-friendly)
    x = x.reshape(b, cfg.in_chans, ph[0], p, ph[1], p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, ph[0] * ph[1], -1)
    x = linear(x, params["patch_embed"]["w"], params["patch_embed"]["b"])
    if cfg.patch_norm:
        x = layer_norm(
            x, params["patch_embed"]["norm_scale"],
            params["patch_embed"]["norm_bias"], cfg.ln_eps,
        )
    if cfg.ape:
        x = x + params["absolute_pos_embed"].astype(x.dtype)
    if train_rng is not None:
        train_rng, k_pos = jax.random.split(train_rng)
        x = dropout(k_pos, cfg.drop_rate, x)
    dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.depths))

    dims = list(cfg.patches_resolution)
    blk = 0
    for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        stage = params["layers"][i]
        x = x.reshape(b, *dims, x.shape[-1])
        for j in range(depth):
            shift = 0 if j % 2 == 0 else cfg.window_size // 2
            k_blk = None
            if train_rng is not None:
                train_rng, k_blk = jax.random.split(train_rng)
            x = _swin_block(
                stage["blocks"][j], x, tuple(dims),
                (cfg.window_size, cfg.window_size), (shift, shift),
                heads, cfg.ln_eps,
                rng=k_blk, dp_rate=float(dpr[blk]),
                drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
            )
            blk += 1
        x = x.reshape(b, dims[0] * dims[1], -1)
        if i < cfg.num_layers - 1:
            x = x.reshape(b, *dims, x.shape[-1])
            x = _patch_merging(stage["downsample"], x, cfg.ln_eps)
            dims = [-(-d // 2) for d in dims]
            x = x.reshape(b, dims[0] * dims[1], -1)
    return layer_norm(x, params["norm_scale"], params["norm_bias"], cfg.ln_eps)


def swin_encode_audio(params, cfg, spec, compute_dtype=jnp.float32,
                      train_rng: Optional[jax.Array] = None):
    """(B, 1, T, M) spectrogram → 3-channel repeat → forward_features
    (reference model/swin.py:602-606)."""
    return swin_forward_features(
        params, cfg, jnp.repeat(spec, 3, axis=1), compute_dtype,
        train_rng=train_rng,
    )


# ---------------------------------------------------------------------------
# 3D VideoSwin
# ---------------------------------------------------------------------------


def videoswin_forward(
    params: Dict, cfg: VideoSwinConfig, video: jnp.ndarray,
    compute_dtype=jnp.float32, train_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(B, 3, D, H, W) → (B, num_features, D', H', W') feature volume
    (reference videoswin.py:441-457). train_rng activates pos dropout +
    per-block regularizers + the stochastic-depth schedule
    (videoswin.py:388-430)."""
    x = video.astype(compute_dtype)
    b, c, d, h, w = x.shape
    pt, ph, pw = cfg.patch_size
    # pad H/W to patch multiples, time by +1 always (videoswin.py:360-367)
    x = jnp.pad(
        x,
        ((0, 0), (0, 0), (0, 1), (0, (-h) % ph), (0, (-w) % pw)),
    )
    d2, h2, w2 = x.shape[2], x.shape[3] // ph, x.shape[4] // pw
    # conv3d k=(pt,ph,pw) stride=(time_stride,ph,pw) — spatial part is a
    # patch-matmul; temporal is a size-pt window sliding at time_stride
    dt = (d2 - pt) // cfg.time_stride + 1
    x = x.reshape(b, c, d2, h2, ph, w2, pw)
    x = x.transpose(0, 2, 3, 5, 1, 4, 6)       # (b, d2, h2, w2, c, ph, pw)
    x = x.reshape(b, d2, h2 * w2, c * ph * pw)
    starts = np.arange(dt) * cfg.time_stride
    slabs = jnp.stack([
        jax.lax.dynamic_slice_in_dim(x, int(s), pt, axis=1) for s in starts
    ], axis=1)                                  # (b, dt, pt, hw, cpp)
    slabs = slabs.transpose(0, 1, 3, 2, 4).reshape(b, dt, h2 * w2, -1)
    x = linear(slabs, params["patch_embed"]["w"], params["patch_embed"]["b"])
    if cfg.patch_norm:
        x = layer_norm(
            x, params["patch_embed"]["norm_scale"],
            params["patch_embed"]["norm_bias"], cfg.ln_eps,
        )

    dims = [dt, h2, w2]
    x = x.reshape(b, *dims, cfg.embed_dim)
    if train_rng is not None:
        train_rng, k_pos = jax.random.split(train_rng)
        x = dropout(k_pos, cfg.drop_rate, x)
    dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.depths))
    blk = 0
    for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        stage = params["layers"][i]
        for j in range(depth):
            shift = (
                (0, 0, 0) if j % 2 == 0
                else tuple(wd // 2 for wd in cfg.window_size)
            )
            k_blk = None
            if train_rng is not None:
                train_rng, k_blk = jax.random.split(train_rng)
            x = _swin_block(
                stage["blocks"][j], x, tuple(dims), cfg.window_size,
                shift, heads, cfg.ln_eps,
                rng=k_blk, dp_rate=float(dpr[blk]),
                drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
            )
            blk += 1
        if i < cfg.num_layers - 1:
            # PatchMerging over H/W only, per frame (videoswin.py:246-266)
            bb, dd = x.shape[0], x.shape[1]
            x = _patch_merging(
                stage["downsample"],
                x.reshape(bb * dd, dims[1], dims[2], -1),
                cfg.ln_eps,
            )
            dims = [dd, -(-dims[1] // 2), -(-dims[2] // 2)]
            x = x.reshape(bb, *dims, -1)

    x = layer_norm(x, params["norm_scale"], params["norm_bias"], cfg.ln_eps)
    return x.transpose(0, 4, 1, 2, 3)


# ---------------------------------------------------------------------------
# init + torch converters
# ---------------------------------------------------------------------------


def _init_block(key, dim, heads, window, mlp_hidden, qkv_bias):
    ks = jax.random.split(key, 4)
    n_rel = int(np.prod([2 * w - 1 for w in window]))
    return {
        "norm1_scale": jnp.ones((dim,)), "norm1_bias": jnp.zeros((dim,)),
        "attn": {
            "qkv_w": jax.random.normal(ks[0], (dim, 3 * dim)) * 0.02,
            "qkv_b": jnp.zeros((3 * dim,)) if qkv_bias else None,
            "proj_w": jax.random.normal(ks[1], (dim, dim)) * 0.02,
            "proj_b": jnp.zeros((dim,)),
            "rel_bias_table": jax.random.normal(ks[2], (n_rel, heads)) * 0.02,
        },
        "norm2_scale": jnp.ones((dim,)), "norm2_bias": jnp.zeros((dim,)),
        "mlp": {
            "fc1_w": jax.random.normal(ks[3], (dim, mlp_hidden)) * 0.02,
            "fc1_b": jnp.zeros((mlp_hidden,)),
            "fc2_w": jax.random.normal(ks[3], (mlp_hidden, dim)) * 0.02,
            "fc2_b": jnp.zeros((dim,)),
        },
    }


def _init_stages(key, cfg, window) -> list:
    layers = []
    for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        dim = int(cfg.embed_dim * 2**i)
        key, *bks = jax.random.split(key, depth + 2)
        stage = {
            "blocks": [
                _init_block(bks[j], dim, heads, window,
                            int(dim * cfg.mlp_ratio), cfg.qkv_bias)
                for j in range(depth)
            ]
        }
        if i < cfg.num_layers - 1:
            stage["downsample"] = {
                "norm_scale": jnp.ones((4 * dim,)),
                "norm_bias": jnp.zeros((4 * dim,)),
                "reduction_w": jax.random.normal(bks[-1], (4 * dim, 2 * dim))
                * 0.02,
            }
        layers.append(stage)
    return layers


def init_swin(key, cfg: SwinConfig) -> Dict:
    k0, k1, k2 = jax.random.split(key, 3)
    patch_in = cfg.in_chans * cfg.patch_size**2
    params = {
        "patch_embed": {
            "w": jax.random.normal(k0, (patch_in, cfg.embed_dim)) * 0.02,
            "b": jnp.zeros((cfg.embed_dim,)),
            "norm_scale": jnp.ones((cfg.embed_dim,)),
            "norm_bias": jnp.zeros((cfg.embed_dim,)),
        },
        "layers": _init_stages(k1, cfg, (cfg.window_size, cfg.window_size)),
        "norm_scale": jnp.ones((cfg.num_features,)),
        "norm_bias": jnp.zeros((cfg.num_features,)),
    }
    if cfg.ape:
        n = cfg.patches_resolution[0] * cfg.patches_resolution[1]
        params["absolute_pos_embed"] = (
            jax.random.normal(k2, (1, n, cfg.embed_dim)) * 0.02
        )
    return params


def init_videoswin(key, cfg: VideoSwinConfig) -> Dict:
    k0, k1 = jax.random.split(key)
    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_chans * pt * ph * pw
    return {
        "patch_embed": {
            "w": jax.random.normal(k0, (patch_in, cfg.embed_dim)) * 0.02,
            "b": jnp.zeros((cfg.embed_dim,)),
            "norm_scale": jnp.ones((cfg.embed_dim,)),
            "norm_bias": jnp.zeros((cfg.embed_dim,)),
        },
        "layers": _init_stages(k1, cfg, cfg.window_size),
        "norm_scale": jnp.ones((cfg.num_features,)),
        "norm_bias": jnp.zeros((cfg.num_features,)),
    }


def _block_from_torch(sd, pfx) -> Dict:
    g = lambda k: np.asarray(sd[pfx + k])
    return {
        "norm1_scale": g("norm1.weight"), "norm1_bias": g("norm1.bias"),
        "attn": {
            "qkv_w": g("attn.qkv.weight").T,
            "qkv_b": g("attn.qkv.bias") if pfx + "attn.qkv.bias" in sd else None,
            "proj_w": g("attn.proj.weight").T,
            "proj_b": g("attn.proj.bias"),
            "rel_bias_table": g("attn.relative_position_bias_table"),
        },
        "norm2_scale": g("norm2.weight"), "norm2_bias": g("norm2.bias"),
        "mlp": {
            "fc1_w": g("mlp.fc1.weight").T, "fc1_b": g("mlp.fc1.bias"),
            "fc2_w": g("mlp.fc2.weight").T, "fc2_b": g("mlp.fc2.bias"),
        },
    }


def _stages_from_torch(sd, cfg, prefix="layers.") -> list:
    layers = []
    for i, depth in enumerate(cfg.depths):
        stage = {
            "blocks": [
                _block_from_torch(sd, f"{prefix}{i}.blocks.{j}.")
                for j in range(depth)
            ]
        }
        dkey = f"{prefix}{i}.downsample.reduction.weight"
        if dkey in sd:
            stage["downsample"] = {
                "norm_scale": np.asarray(sd[f"{prefix}{i}.downsample.norm.weight"]),
                "norm_bias": np.asarray(sd[f"{prefix}{i}.downsample.norm.bias"]),
                "reduction_w": np.asarray(sd[dkey]).T,
            }
        layers.append(stage)
    return layers


def swin_from_torch(sd: Dict, cfg: SwinConfig) -> Dict:
    """Convert a reference 2D Swin state_dict (conv patch embed →
    patch-matmul layout: (C_out, C_in, p, p) → (C_in·p·p, C_out) with
    channel-major patch pixel order matching the forward's reshape)."""
    w = np.asarray(sd["patch_embed.proj.weight"])  # (E, C, p, p)
    e = w.shape[0]
    params = {
        "patch_embed": {
            "w": w.reshape(e, -1).T,
            "b": np.asarray(sd["patch_embed.proj.bias"]),
        },
        "layers": _stages_from_torch(sd, cfg),
        "norm_scale": np.asarray(sd["norm.weight"]),
        "norm_bias": np.asarray(sd["norm.bias"]),
    }
    if cfg.patch_norm:
        params["patch_embed"]["norm_scale"] = np.asarray(sd["patch_embed.norm.weight"])
        params["patch_embed"]["norm_bias"] = np.asarray(sd["patch_embed.norm.bias"])
    if cfg.ape and "absolute_pos_embed" in sd:
        params["absolute_pos_embed"] = np.asarray(sd["absolute_pos_embed"])
    return jax.tree.map(jnp.asarray, params)


def videoswin_from_torch(sd: Dict, cfg: VideoSwinConfig) -> Dict:
    """(E, C, pt, ph, pw) conv3d kernel → ((C·ph·pw)·pt, E) matching the
    forward's (pt, c·ph·pw) slab layout."""
    w = np.asarray(sd["patch_embed.proj.weight"])  # (E, C, pt, ph, pw)
    e, c, pt, ph, pw = w.shape
    # forward builds slabs as (pt, c*ph*pw) flattened → order (pt, c, ph, pw)
    w = w.transpose(2, 1, 3, 4, 0).reshape(pt * c * ph * pw, e)
    params = {
        "patch_embed": {
            "w": w,
            "b": np.asarray(sd["patch_embed.proj.bias"]),
        },
        "layers": _stages_from_torch(sd, cfg),
        "norm_scale": np.asarray(sd["norm.weight"]),
        "norm_bias": np.asarray(sd["norm.bias"]),
    }
    if cfg.patch_norm:
        params["patch_embed"]["norm_scale"] = np.asarray(sd["patch_embed.norm.weight"])
        params["patch_embed"]["norm_bias"] = np.asarray(sd["patch_embed.norm.bias"])
    return jax.tree.map(jnp.asarray, params)


def swin_config_from_yaml(path: str) -> SwinConfig:
    """Load the reference's yacs-style yaml (model/swin_config.py:49-91 +
    model/swin_base_patch4_window7_224_22k.yaml): MODEL.SWIN.* keys override
    the defaults; DATA.IMG_SIZE sets img_size."""
    import yaml

    with open(path) as f:
        y = yaml.safe_load(f) or {}
    swin = (y.get("MODEL") or {}).get("SWIN") or {}
    data = y.get("DATA") or {}
    kw = {}
    mapping = {
        "PATCH_SIZE": "patch_size", "IN_CHANS": "in_chans",
        "EMBED_DIM": "embed_dim", "DEPTHS": "depths",
        "NUM_HEADS": "num_heads", "WINDOW_SIZE": "window_size",
        "MLP_RATIO": "mlp_ratio", "QKV_BIAS": "qkv_bias",
        "APE": "ape", "PATCH_NORM": "patch_norm",
    }
    for yk, fk in mapping.items():
        if yk in swin:
            v = swin[yk]
            kw[fk] = tuple(v) if isinstance(v, list) else v
    if "IMG_SIZE" in data:
        kw["img_size"] = data["IMG_SIZE"]
    return SwinConfig(**kw)
