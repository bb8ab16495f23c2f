"""CLIP ModifiedResNet visual tower, TPU-native.

Capability parity with the reference (model/evaclip/modified_resnet.py:1-181):
3-conv anti-aliased stem with avg-pool, four bottleneck stages where strided
convs are replaced by stride-1 conv + prepended 2x2 avg-pool (both in the
residual branch and the downsample shortcut), and a QKV attention pool whose
query is the mean token with a learned (HW+1) positional embedding.

TPU-first: NCHW convolutions through `lax.conv_general_dilated` (XLA maps
them onto the MXU), inference-mode BatchNorm folded to a per-channel
scale/shift (these towers ship frozen pretrained stats; reference freezes BN
via freeze_batch_norm_2d), and the attention pool as one fused MHA.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.ops.layers import linear

EXPANSION = 4


@dataclass(frozen=True)
class ModifiedResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)     # RN50
    output_dim: int = 1024
    heads: int = 32
    image_size: int = 224
    width: int = 64

    @property
    def embed_dim(self) -> int:
        return self.width * 32

    @property
    def pool_grid(self) -> int:
        return self.image_size // 32


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _bn(x, p):
    """Inference BatchNorm as scale/shift from stored statistics."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + 1e-5)
    s = (p["w"] * inv)[None, :, None, None].astype(x.dtype)
    b = (p["b"] - p["mean"] * p["w"] * inv)[None, :, None, None].astype(x.dtype)
    return x * s + b


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID"
    ) / float(k * k)


def _bottleneck(x, p, stride):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], padding=1), p["bn2"]))
    if stride > 1:
        out = _avgpool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "down_conv" in p:
        sc = x if stride == 1 else _avgpool(x, stride)
        shortcut = _bn(_conv(sc, p["down_conv"]), p["down_bn"])
    else:
        shortcut = x
    return jax.nn.relu(out + shortcut)


def _attention_pool(x, p, heads):
    """NCHW → pooled (N, output_dim): mean-token query over [mean; tokens]
    with learned positions (reference AttentionPool2d:58-95; it runs MHA
    with every token as a query and keeps output[0] — attending with only
    the mean token is the same result at 1/(HW+1) the score FLOPs)."""
    n, c, h, w = x.shape
    t = x.reshape(n, c, h * w).transpose(0, 2, 1)           # (N, HW, C)
    t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)
    t = t + p["pos"].astype(t.dtype)[None]

    q = linear(t[:, :1], p["q_w"], p["q_b"])                # query = mean tok
    k = linear(t, p["k_w"], p["k_b"])
    v = linear(t, p["v_w"], p["v_b"])
    hd = c // heads
    q = q.reshape(n, 1, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(n, -1, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(n, -1, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                   preferred_element_type=jnp.float32) * (hd**-0.5)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("nhqk,nhkd->nhqd", a, v)
    o = o.transpose(0, 2, 1, 3).reshape(n, 1, c)[:, 0]
    return linear(o, p["c_w"], p["c_b"])


def modified_resnet_forward(
    params: Dict, cfg: ModifiedResNetConfig, pixels: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(B, 3, H, W) → (B, output_dim)."""
    x = pixels.astype(compute_dtype)
    for i in (1, 2, 3):
        x = jax.nn.relu(
            _bn(_conv(x, params[f"stem_conv{i}"],
                      stride=2 if i == 1 else 1, padding=1),
                params[f"stem_bn{i}"])
        )
    x = _avgpool(x, 2)
    for si, stage in enumerate(params["stages"]):
        for bi, bp in enumerate(stage):
            stride = (2 if si > 0 else 1) if bi == 0 else 1
            x = _bottleneck(x, bp, stride)
    return _attention_pool(x, params["attnpool"], cfg.heads)


def _bn_init(c):
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_modified_resnet(key: jax.Array, cfg: ModifiedResNetConfig) -> Dict:
    w = cfg.width
    ks = iter(jax.random.split(key, 4 + sum(cfg.layers) * 4 + 8))
    he = lambda k, shape: jax.random.normal(k, shape) * np.sqrt(
        2.0 / (shape[1] * shape[2] * shape[3])
    )
    params = {
        "stem_conv1": he(next(ks), (w // 2, 3, 3, 3)),
        "stem_bn1": _bn_init(w // 2),
        "stem_conv2": he(next(ks), (w // 2, w // 2, 3, 3)),
        "stem_bn2": _bn_init(w // 2),
        "stem_conv3": he(next(ks), (w, w // 2, 3, 3)),
        "stem_bn3": _bn_init(w),
    }
    stages: List[List[Dict]] = []
    inplanes = w
    for si, n_blocks in enumerate(cfg.layers):
        planes = w * (2**si)
        stage = []
        for bi in range(n_blocks):
            p = {
                "conv1": he(next(ks), (planes, inplanes, 1, 1)),
                "bn1": _bn_init(planes),
                "conv2": he(next(ks), (planes, planes, 3, 3)),
                "bn2": _bn_init(planes),
                "conv3": he(next(ks), (planes * EXPANSION, planes, 1, 1)),
                "bn3": _bn_init(planes * EXPANSION),
            }
            stride = (2 if si > 0 else 1) if bi == 0 else 1
            if stride > 1 or inplanes != planes * EXPANSION:
                p["down_conv"] = he(
                    next(ks), (planes * EXPANSION, inplanes, 1, 1)
                )
                p["down_bn"] = _bn_init(planes * EXPANSION)
            stage.append(p)
            inplanes = planes * EXPANSION
        stages.append(stage)
    params["stages"] = stages

    c = cfg.embed_dim
    kq = jax.random.split(next(ks), 6)
    params["attnpool"] = {
        "pos": jax.random.normal(kq[0], (cfg.pool_grid**2 + 1, c)) * c**-0.5,
        "q_w": jax.random.normal(kq[1], (c, c)) * c**-0.5, "q_b": jnp.zeros((c,)),
        "k_w": jax.random.normal(kq[2], (c, c)) * c**-0.5, "k_b": jnp.zeros((c,)),
        "v_w": jax.random.normal(kq[3], (c, c)) * c**-0.5, "v_b": jnp.zeros((c,)),
        "c_w": jax.random.normal(kq[4], (c, cfg.output_dim)) * c**-0.5,
        "c_b": jnp.zeros((cfg.output_dim,)),
    }
    return params


def modified_resnet_from_torch(sd: Dict, cfg: ModifiedResNetConfig,
                               prefix: str = "") -> Dict:
    g = lambda k: np.asarray(sd[prefix + k])

    def bn(name):
        return {"w": g(f"{name}.weight"), "b": g(f"{name}.bias"),
                "mean": g(f"{name}.running_mean"),
                "var": g(f"{name}.running_var")}

    params = {}
    for i in (1, 2, 3):
        params[f"stem_conv{i}"] = g(f"conv{i}.weight")
        params[f"stem_bn{i}"] = bn(f"bn{i}")
    stages = []
    for si, n_blocks in enumerate(cfg.layers):
        stage = []
        for bi in range(n_blocks):
            base = f"layer{si + 1}.{bi}"
            p = {
                "conv1": g(f"{base}.conv1.weight"), "bn1": bn(f"{base}.bn1"),
                "conv2": g(f"{base}.conv2.weight"), "bn2": bn(f"{base}.bn2"),
                "conv3": g(f"{base}.conv3.weight"), "bn3": bn(f"{base}.bn3"),
            }
            if f"{prefix}{base}.downsample.0.weight" in sd:
                p["down_conv"] = g(f"{base}.downsample.0.weight")
                p["down_bn"] = bn(f"{base}.downsample.1")
            stage.append(p)
        stages.append(stage)
    params["stages"] = stages
    params["attnpool"] = {
        "pos": g("attnpool.positional_embedding"),
        "q_w": g("attnpool.q_proj.weight").T, "q_b": g("attnpool.q_proj.bias"),
        "k_w": g("attnpool.k_proj.weight").T, "k_b": g("attnpool.k_proj.bias"),
        "v_w": g("attnpool.v_proj.weight").T, "v_b": g("attnpool.v_proj.bias"),
        "c_w": g("attnpool.c_proj.weight").T, "c_b": g("attnpool.c_proj.bias"),
    }
    return jax.tree.map(jnp.asarray, params)
