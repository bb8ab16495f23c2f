"""EVA Vision Transformer, TPU-native.

Functional re-design of the reference `EVAVisionTransformer`
(model/evaclip/eva_vit_model.py:488-659) with the same numerics:

  - patch embed: conv k=p=s → expressed as reshape + one MXU matmul
  - CLS token + absolute pos embed (+ optional 2D axial RoPE, EVA02)
  - pre/post-norm blocks, fused-qkv with q/v-only bias
    (eva_vit_model.py:244-251,305-312), optional LayerScale (gamma_1/2),
    MLP-GELU or SwiGLU (+ optional sub-LN), LN eps 1e-6
  - final LN over all tokens when global_average_pool is off
    (eva_vit_model.py:542,641), `return_all_features` token output

TPU-first choices: the `depth` transformer blocks are a single `lax.scan`
over stacked parameters (one compile, MXU-friendly, remat-able per block),
activations run in bf16 with fp32 LayerNorm statistics and fp32 attention
softmax, and attention uses the Pallas flash kernel.

Parameter tree (all leaves jnp arrays; linears stored (in, out)):
  patch_embed/{kernel,bias}; cls_token; pos_embed;
  blocks/{norm1_w,...}: leading axis = depth (stacked for scan);
  norm_w, norm_b (final LN); head/{kernel,bias} optional CLIP projection.
"""

from __future__ import annotations

import functools
import logging
import math
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np

from mico_tpu.config import EvaVitConfig
from mico_tpu.ops.attention import multi_head_attention
from mico_tpu.ops.layers import gelu, layer_norm, linear


# ---------------------------------------------------------------------------
# RoPE tables (EVA02; reference model/evaclip/rope.py:79-137)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def rope_tables(head_dim: int, pt_seq_len: int, ft_seq_len: int, theta: float = 10000.0):
    """Axial 2D rotary tables of shape (ft_seq_len**2, head_dim)."""
    dim = head_dim // 2  # per-axis rotary dim
    freqs = 1.0 / (
        theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim)
    )
    t = np.arange(ft_seq_len, dtype=np.float64) / ft_seq_len * pt_seq_len
    fr = np.einsum("i,j->ij", t, freqs)             # (ft, dim//2)
    fr = np.repeat(fr, 2, axis=-1)                   # (ft, dim)
    full = np.concatenate(
        [
            np.broadcast_to(fr[:, None, :], (ft_seq_len, ft_seq_len, dim)),
            np.broadcast_to(fr[None, :, :], (ft_seq_len, ft_seq_len, dim)),
        ],
        axis=-1,
    ).reshape(ft_seq_len * ft_seq_len, head_dim)
    # numpy (not jnp) so the lru_cache never captures a tracer-stage constant
    return (
        np.cos(full).astype(np.float32),
        np.sin(full).astype(np.float32),
    )


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope(x: jnp.ndarray, cos, sin) -> jnp.ndarray:
    """x: (..., seq, head_dim); CLS excluded by the caller."""
    cos = jnp.asarray(cos).astype(x.dtype)
    sin = jnp.asarray(sin).astype(x.dtype)
    return x * cos + _rotate_half(x) * sin


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def init_eva_vit(key: jax.Array, cfg: EvaVitConfig) -> dict:
    """Random init mirroring the reference scheme: trunc_normal(0.02) linears,
    zero biases, unit LN, and `fix_init_weight` rescale of each block's output
    projections by sqrt(2*layer_id) (eva_vit_model.py:565-574)."""
    w, h, d = cfg.width, cfg.mlp_hidden, cfg.layers
    ks = iter(jax.random.split(key, 64))
    nxt = lambda: next(ks)

    def tn(shape, std=0.02):
        return _trunc_normal(nxt(), shape, std)

    rescale = jnp.sqrt(2.0 * (jnp.arange(d, dtype=jnp.float32) + 1.0))
    rescale = rescale[:, None, None]

    blocks = {
        "norm1_w": jnp.ones((d, w)), "norm1_b": jnp.zeros((d, w)),
        "norm2_w": jnp.ones((d, w)), "norm2_b": jnp.zeros((d, w)),
        "qkv_w": tn((d, w, 3 * w)),
        "q_bias": jnp.zeros((d, w)), "v_bias": jnp.zeros((d, w)),
        "proj_w": tn((d, w, w)) / rescale,
        "proj_b": jnp.zeros((d, w)),
    }
    if cfg.naiveswiglu:
        blocks.update(
            w1_w=tn((d, w, h)), w1_b=jnp.zeros((d, h)),
            w2_w=tn((d, w, h)), w2_b=jnp.zeros((d, h)),
            w3_w=tn((d, h, w)) / rescale, w3_b=jnp.zeros((d, w)),
        )
    else:
        blocks.update(
            fc1_w=tn((d, w, h)), fc1_b=jnp.zeros((d, h)),
            fc2_w=tn((d, h, w)) / rescale, fc2_b=jnp.zeros((d, w)),
        )
    if cfg.subln:
        blocks.update(
            ffn_ln_w=jnp.ones((d, h)), ffn_ln_b=jnp.zeros((d, h)),
            inner_attn_ln_w=jnp.ones((d, w)), inner_attn_ln_b=jnp.zeros((d, w)),
        )
        # subln splits qkv into separate projections with q/v bias only —
        # we keep the fused layout; converter packs q/k/v into qkv_w.
    if cfg.ls_init_value is not None:
        blocks["gamma_1"] = cfg.ls_init_value * jnp.ones((d, w))
        blocks["gamma_2"] = cfg.ls_init_value * jnp.ones((d, w))
    if cfg.use_rel_pos_bias:
        blocks["rel_pos_bias_table"] = jnp.zeros(
            (d, num_relative_distance(cfg.grid_size), cfg.num_heads)
        )

    params = {
        "patch_embed": {
            "kernel": tn((3 * cfg.patch_size**2, w)),
            "bias": jnp.zeros((w,)),
        },
        "cls_token": tn((1, 1, w)),
        "pos_embed": tn((1, cfg.seq_len, w)),
        "blocks": blocks,
        "norm_w": jnp.ones((w,)), "norm_b": jnp.zeros((w,)),
        "head": {"kernel": tn((w, cfg.embed_dim)), "bias": jnp.zeros((cfg.embed_dim,))},
    }
    if cfg.use_shared_rel_pos_bias:
        params["rel_pos_bias_table"] = jnp.zeros(
            (num_relative_distance(cfg.grid_size), cfg.num_heads)
        )
    return params


def fold_inference_params(params: dict, cfg: EvaVitConfig) -> dict:
    """Inference-time constant folding: move every LayerNorm affine (γ, β)
    into the matmul it feeds and every LayerScale (gamma_1/gamma_2) into the
    matmul that produces it.

    LN(x)·W + b = ((x−μ)·rsqrt) · (γ∘W) + (b + β·W), and (h·W + b)∘g =
    h·(W∘g) + b∘g — pure reparametrizations, so the forward math is
    unchanged while the per-element affine work disappears from the
    LN-producer fusions feeding the MXU (measured ~2% on the ViT-g bench
    step). The folded dict omits the folded keys; _block and layer_norm
    treat the absent keys as identity. Pre-norm only for the block LNs
    (post-norm LNs do not feed a matmul); the final `norm` is returned
    as-is (its output is the model output when return_all_features).

    Training must use the unfolded params (the optimizer and checkpoints
    keep the canonical layout; fold after loading, before jit)."""
    bp = dict(params["blocks"])

    def fold_into(wb_key_w, wb_key_b, ln_w, ln_b):
        """LN (γ=ln_w, β=ln_b) feeding blocks' wb_key_w/_b: scale the
        weight's input rows by γ and absorb β through the weight."""
        w = bp[wb_key_w]
        bp[wb_key_b] = bp[wb_key_b] + jnp.einsum("dw,dwo->do", ln_b, w)
        bp[wb_key_w] = w * ln_w[:, :, None]

    def scale_out(wb_key_w, wb_key_b, g):
        bp[wb_key_w] = bp[wb_key_w] * g[:, None, :]
        bp[wb_key_b] = bp[wb_key_b] * g

    if not cfg.postnorm:
        n1w, n1b = bp.pop("norm1_w"), bp.pop("norm1_b")
        q_b, v_b = bp.pop("q_bias"), bp.pop("v_bias")
        qkv_bias = jnp.concatenate([q_b, jnp.zeros_like(q_b), v_b], axis=-1)
        bp["qkv_bias"] = qkv_bias + jnp.einsum("dw,dwo->do", n1b, bp["qkv_w"])
        bp["qkv_w"] = bp["qkv_w"] * n1w[:, :, None]
        n2w, n2b = bp.pop("norm2_w"), bp.pop("norm2_b")
        if cfg.naiveswiglu:
            fold_into("w1_w", "w1_b", n2w, n2b)
            fold_into("w2_w", "w2_b", n2w, n2b)
        else:
            fold_into("fc1_w", "fc1_b", n2w, n2b)
    if cfg.subln:
        fold_into("proj_w", "proj_b",
                  bp.pop("inner_attn_ln_w"), bp.pop("inner_attn_ln_b"))
        tgt = "w3" if cfg.naiveswiglu else "fc2"
        fold_into(f"{tgt}_w", f"{tgt}_b",
                  bp.pop("ffn_ln_w"), bp.pop("ffn_ln_b"))
    if "gamma_1" in bp:
        scale_out("proj_w", "proj_b", bp.pop("gamma_1"))
    if "gamma_2" in bp:
        scale_out("w3_w" if cfg.naiveswiglu else "fc2_w",
                  "w3_b" if cfg.naiveswiglu else "fc2_b", bp.pop("gamma_2"))
    out = dict(params)
    out["blocks"] = bp
    return out


# ---------------------------------------------------------------------------
# BEiT-style relative position bias (eva_vit_model.py:451-485)
# ---------------------------------------------------------------------------


def num_relative_distance(grid: int) -> int:
    # (2g-1)^2 in-window offsets + 3 special buckets (cls→tok, tok→cls,
    # cls→cls)
    return (2 * grid - 1) ** 2 + 3


@functools.lru_cache(maxsize=8)
def rel_pos_index(grid: int) -> np.ndarray:
    """(L, L) int bucket index over the (CLS + grid²) token sequence."""
    coords = np.stack(
        np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    ).reshape(2, -1)                                     # (2, g²)
    rel = coords[:, :, None] - coords[:, None, :]        # (2, g², g²)
    rel = rel.transpose(1, 2, 0) + (grid - 1)            # to [0, 2g-2]
    flat = rel[:, :, 0] * (2 * grid - 1) + rel[:, :, 1]
    n = num_relative_distance(grid)
    idx = np.zeros((grid * grid + 1, grid * grid + 1), np.int32)
    idx[1:, 1:] = flat
    idx[0, :] = n - 3
    idx[:, 0] = n - 2
    idx[0, 0] = n - 1
    return idx


def rel_pos_bias_from_table(table: jnp.ndarray, grid: int) -> jnp.ndarray:
    """(num_rel_dist, nh) table → additive (1, nh, L, L) attention bias."""
    idx = jnp.asarray(rel_pos_index(grid))
    bias = table[idx.reshape(-1)].reshape(*idx.shape, -1)
    return bias.transpose(2, 0, 1)[None]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def patch_embed(params: dict, cfg: EvaVitConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels (B, 3, H, W) → tokens (B, num_patches, width).

    Equivalent to the reference Conv2d(k=p=s) patch embed
    (eva_vit_model.py:427-448) as a single matmul: patches flattened in
    (c, dy, dx) order to match the conv-weight layout."""
    b = pixels.shape[0]
    p, g = cfg.patch_size, cfg.grid_size
    x = pixels.reshape(b, 3, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, 3 * p * p)
    return linear(x, params["kernel"], params["bias"])


def _drop_path(key: Optional[jax.Array], rate, x: jnp.ndarray) -> jnp.ndarray:
    """Stochastic depth on the residual branch (reference DropPath,
    eva_vit_model.py per-block drop-path schedule): per-sample Bernoulli
    keep, scaled by 1/keep_prob. Identity when no rng (eval)."""
    if key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0], 1, 1))
    return jnp.where(mask, x / keep.astype(x.dtype), jnp.zeros_like(x))


def _block(
    x: jnp.ndarray,
    bp: dict,
    cfg: EvaVitConfig,
    rope_cos: Optional[jnp.ndarray],
    rope_sin: Optional[jnp.ndarray],
    attn_impl: str,
    dp_key: Optional[jax.Array] = None,
    dp_rate=0.0,
    shared_rel_bias: Optional[jnp.ndarray] = None,
    is_train: bool = False,
) -> jnp.ndarray:
    """One transformer block on (B, L, W). bp holds this layer's params."""
    b, l, w = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    eps = cfg.ln_eps

    def attention(h):
        if "qkv_bias" in bp:                   # folded (fold_inference_params)
            qkv_bias = bp["qkv_bias"]
        else:
            qkv_bias = jnp.concatenate(
                [bp["q_bias"], jnp.zeros_like(bp["q_bias"]), bp["v_bias"]]
            )
        rel_bias = shared_rel_bias
        if "rel_pos_bias_table" in bp:     # per-block tables (use_rel_pos_bias)
            rel_bias = rel_pos_bias_from_table(
                bp["rel_pos_bias_table"], cfg.grid_size
            )
        impl = attn_impl
        if impl == "auto":
            impl = "flash" if jax.default_backend() == "tpu" else "xla"
        from mico_tpu.ops import flash_attention as fa

        if (rope_cos is None and rel_bias is None and impl == "flash"
                and fa.FUSED_QKV_PROJ and not is_train):
            # is_train gates TRAINING out of the fused route: the fused
            # forward only pays on non-differentiated calls, and at the
            # mix's b16 memory ceiling its extra residual pressure tips
            # the step into HBM spilling (measured round 4: 5577.8 vs
            # 3075.4 ms/step). Training keeps the round-3 unfused path.
            if fa.FUSED_ATTN_PROJ and not cfg.subln:
                # both projections in-kernel: qkv AND the raw attention
                # output never exist in HBM
                return jax.ad_checkpoint.checkpoint_name(
                    fa.fused_qkv_attn_proj(
                        h, bp["qkv_w"], qkv_bias,
                        bp["proj_w"], bp["proj_b"], nh, hd**-0.5,
                    ),
                    "attn_out",
                )
            # measured-default route: the qkv projection runs INSIDE the
            # attention kernel with the weight VMEM-resident — the
            # (B, L, 3W) qkv tensor never touches HBM
            o = fa.fused_qkv_self_attention(
                h, bp["qkv_w"], qkv_bias, nh, hd**-0.5
            )
            qkv = None
        else:
            # remat tag: saving the packed qkv (2.1 MB/frame/layer bf16)
            # lets a names-based policy skip re-running the qkv projection —
            # the second-biggest matmul of the block (~23% of fwd FLOPs) —
            # in the backward; the Pallas attention bwd consumes q/k/v
            # directly.
            qkv = jax.ad_checkpoint.checkpoint_name(
                linear(h, bp["qkv_w"], qkv_bias), "qkv"
            )                                                     # (B, L, 3W)
        if qkv is None:
            pass
        elif rope_cos is None and rel_bias is None and impl == "flash":
            # hot path: the fused qkv tensor goes straight into the kernel —
            # no split copy and no (B, H, L, D) transposes in HBM
            o = fa.packed_qkv_self_attention(qkv, nh, hd**-0.5)
        else:
            qkv = qkv.reshape(b, l, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]                      # (B, H, L, D)
            if rope_cos is not None:
                q = jnp.concatenate(
                    [q[:, :, :1], apply_rope(q[:, :, 1:], rope_cos, rope_sin)],
                    axis=2,
                )
                k = jnp.concatenate(
                    [k[:, :, :1], apply_rope(k[:, :, 1:], rope_cos, rope_sin)],
                    axis=2,
                )
            o = multi_head_attention(
                q, k, v, bias=rel_bias, scale=hd**-0.5, impl=impl
            )
            o = o.transpose(0, 2, 1, 3).reshape(b, l, w)
        if cfg.subln:
            o = layer_norm(o, bp.get("inner_attn_ln_w"),
                           bp.get("inner_attn_ln_b"), eps)
        # remat tag: saving this (0.7 MB/frame/layer) lets a names-based
        # policy skip re-running qkv+attention+proj in the backward
        return jax.ad_checkpoint.checkpoint_name(
            linear(o, bp["proj_w"], bp["proj_b"]), "attn_out"
        )

    def mlp(h):
        if cfg.naiveswiglu:
            h1 = linear(h, bp["w1_w"], bp["w1_b"])
            h2 = linear(h, bp["w2_w"], bp["w2_b"])
            hh = jax.nn.silu(h1) * h2
            if cfg.subln:
                hh = layer_norm(hh, bp.get("ffn_ln_w"), bp.get("ffn_ln_b"), eps)
            return linear(hh, bp["w3_w"], bp["w3_b"])
        # remat tag: saving the fc1 preactivation (3.2 MB/frame/layer bf16)
        # skips re-running fc1 — the single biggest matmul (~24% of fwd
        # FLOPs) — in the backward; gelu/LN recompute from it on the VPU.
        hh = gelu(jax.ad_checkpoint.checkpoint_name(
            linear(h, bp["fc1_w"], bp["fc1_b"]), "mlp_hidden"
        ))
        if cfg.subln:
            hh = layer_norm(hh, bp.get("ffn_ln_w"), bp.get("ffn_ln_b"), eps)
        return linear(hh, bp["fc2_w"], bp["fc2_b"])

    def scaled(branch, gamma_key):
        def f(h):
            y = branch(h)
            if gamma_key in bp:
                y = y * bp[gamma_key].astype(y.dtype)
            return y
        return f

    attn_out = scaled(attention, "gamma_1")
    mlp_out = scaled(mlp, "gamma_2")
    if dp_key is None:
        ka = kb = None
    else:
        ka, kb = jax.random.split(dp_key)

    def attention_ln_fused(xr):
        """Pre-norm attention on the RAW residual stream through the
        LN-fused kernel (normalized tensor never in HBM). Only reached
        when `_ln_fusable` below is True."""
        from mico_tpu.ops import flash_attention as fa

        if "qkv_bias" in bp:
            qkv_bias = bp["qkv_bias"]
        else:
            qkv_bias = jnp.concatenate(
                [bp["q_bias"], jnp.zeros_like(bp["q_bias"]), bp["v_bias"]]
            )
        g = bp.get("norm1_w")
        affine = g is not None
        if not affine:
            g = jnp.ones((w,), xr.dtype)
            b0 = jnp.zeros((w,), xr.dtype)
        else:
            b0 = bp["norm1_b"]
        o = fa.fused_ln_qkv_self_attention(
            xr, g, b0, bp["qkv_w"], qkv_bias, nh, hd**-0.5, eps, affine,
        )
        return jax.ad_checkpoint.checkpoint_name(
            linear(o, bp["proj_w"], bp["proj_b"]), "attn_out"
        )

    def _ln_fusable():
        from mico_tpu.ops import flash_attention as fa

        impl = attn_impl
        if impl == "auto":
            impl = "flash" if jax.default_backend() == "tpu" else "xla"
        return (
            fa.FUSED_LN_QKV and fa.FUSED_QKV_PROJ and impl == "flash"
            and rope_cos is None and shared_rel_bias is None
            and "rel_pos_bias_table" not in bp and not cfg.subln
            and not is_train         # training: see the gate in attention()
        )

    if cfg.postnorm:
        x = x + _drop_path(
            ka, dp_rate, layer_norm(attn_out(x), bp["norm1_w"], bp["norm1_b"], eps)
        )
        x = x + _drop_path(
            kb, dp_rate, layer_norm(mlp_out(x), bp["norm2_w"], bp["norm2_b"], eps)
        )
    elif _ln_fusable():
        x = x + _drop_path(
            ka, dp_rate,
            scaled(attention_ln_fused, "gamma_1")(x),
        )
        x = x + _drop_path(
            kb, dp_rate,
            mlp_out(layer_norm(x, bp.get("norm2_w"), bp.get("norm2_b"), eps)),
        )
    else:
        # keep the original expression shape when not LN-fusing: routing
        # the plain path through a wrapper closure (round-4 interim state)
        # shifted XLA's buffer liveness enough to tip the memory-ceiling
        # production mix into HBM spilling — 5572 vs 3075 ms/step with
        # IDENTICAL math
        x = x + _drop_path(
            ka, dp_rate,
            attn_out(layer_norm(x, bp.get("norm1_w"), bp.get("norm1_b"), eps)),
        )
        x = x + _drop_path(
            kb, dp_rate,
            mlp_out(layer_norm(x, bp.get("norm2_w"), bp.get("norm2_b"), eps)),
        )
    return x


def eva_vit_forward(
    params: dict,
    cfg: EvaVitConfig,
    pixels: jnp.ndarray,
    *,
    return_all_features: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "auto",
    remat: bool = False,
    remat_policy: Optional[str] = None,
    unroll_blocks: bool = False,
    train_rng: Optional[jax.Array] = None,
    pipeline_stages: int = 1,
    pipeline_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """pixels (B, 3, H, W) → (B, seq_len, width) if return_all_features,
    else pooled (B, width) per reference semantics (eva_vit_model.py:611-650).

    With `train_rng` set, the training-time stochastic regularizers run:
    PatchDropout keeping a random (1 - cfg.patch_dropout) patch subset per
    sample with CLS exempt (reference transformer.py:144-185, applied after
    pos-embed eva_vit_model.py:617-631), and per-block stochastic depth on a
    linear 0→cfg.drop_path_rate schedule. Both are no-ops at eval."""
    x = pixels.astype(compute_dtype)
    x = patch_embed(params["patch_embed"], cfg, x)
    b = x.shape[0]
    cls = jnp.broadcast_to(
        params["cls_token"].astype(compute_dtype), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(compute_dtype)

    if cfg.rope:
        ft = cfg.grid_size
        cos, sin = rope_tables(cfg.head_dim, cfg.pt_hw_seq_len, ft)
    else:
        cos, sin = None, None

    dp_keys = None
    if train_rng is not None:
        train_rng, pd_rng = jax.random.split(train_rng)
        if cfg.patch_dropout > 0.0:
            n_patches = x.shape[1] - 1
            n_keep = max(1, int(n_patches * (1.0 - cfg.patch_dropout)))
            scores = jax.random.uniform(pd_rng, (b, n_patches))
            keep = jax.lax.top_k(scores, n_keep)[1]            # (B, n_keep)
            patches = jnp.take_along_axis(
                x[:, 1:], keep[:, :, None], axis=1
            )
            x = jnp.concatenate([x[:, :1], patches], axis=1)
            if cos is not None:
                # per-sample rope tables for the kept patches
                # (reference rope.py:121-135 patch-dropout gather path)
                cos = cos[keep][:, None]                        # (B,1,n_keep,D)
                sin = sin[keep][:, None]
        if cfg.drop_path_rate > 0.0:
            dp_keys = jax.random.split(train_rng, cfg.layers)

    dp_rates = jnp.linspace(0.0, cfg.drop_path_rate, cfg.layers)

    shared_bias = None
    if cfg.use_shared_rel_pos_bias:
        shared_bias = rel_pos_bias_from_table(
            params["rel_pos_bias_table"], cfg.grid_size
        )

    is_train = train_rng is not None
    if dp_keys is None:
        def body(h, bp):
            return _block(
                h, bp, cfg, cos, sin, attn_impl, shared_rel_bias=shared_bias,
                is_train=is_train,
            ), None

        xs = params["blocks"]
    else:
        def body(h, xs):
            bp, key, rate = xs
            return _block(
                h, bp, cfg, cos, sin, attn_impl, dp_key=key, dp_rate=rate,
                shared_rel_bias=shared_bias, is_train=is_train,
            ), None

        xs = (params["blocks"], dp_keys, dp_rates)

    if remat:
        if remat_policy and remat_policy.startswith("save:"):
            # e.g. "save:attn_out" — keep only the tagged intermediates
            names = remat_policy[5:].split(",")
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_only_these_names(*names),
            )
        elif remat_policy:
            body = jax.checkpoint(
                body, policy=getattr(jax.checkpoint_policies, remat_policy)
            )
        else:
            body = jax.checkpoint(body)

    if pipeline_stages > 1:
        # GPipe over the `model` mesh axis (mico_tpu/parallel/
        # pipeline_parallel.py): each stage owns layers/stages blocks,
        # microbatches march with ppermute hops; batch stays sharded over
        # `data` (DP x PP). Requires an ambient mesh
        # (jax.sharding.set_mesh) with a `model` axis of this size.
        from mico_tpu.parallel.pipeline_parallel import pipelined

        assert cfg.layers % pipeline_stages == 0, (
            f"layers {cfg.layers} not divisible by stages {pipeline_stages}"
        )
        if pipeline_microbatches is None:
            # auto: pipelined() picks the largest divisor of the per-shard
            # batch <= 2*stages (fill-drain bubble (S-1)/(S+M-1) stays
            # under ~1/3 while never producing zero-size microbatches)
            logging.getLogger(__name__).info(
                "pipeline: %d stages, auto microbatches (<= %d)",
                pipeline_stages, 2 * pipeline_stages,
            )
        else:
            bubble = (pipeline_stages - 1) / (
                pipeline_stages + pipeline_microbatches - 1
            )
            logging.getLogger(__name__).info(
                "pipeline: %d stages x %d microbatches, bubble %.2f",
                pipeline_stages, pipeline_microbatches, bubble,
            )

        def layer_fn(stage_xs, h):
            out, _ = jax.lax.scan(body, h, stage_xs)
            return out

        run = pipelined(
            layer_fn, mesh=None, axis="model",
            n_micro=pipeline_microbatches, data_axis="data",
        )
        x = run(xs, x)
    elif unroll_blocks:
        # Python-unrolled layer march for TRAINING: the scan's backward
        # accumulates per-layer weight grads (and, without remat, saved
        # activations) by dynamic-update-slice into stacked (layers, ...)
        # buffers, which XLA fails to alias in place — each update copies
        # the whole stack (micro-repro: scan+remat 84.7 TF/s vs unrolled
        # 89.3 at L=40/D=2048/B=8192). Unrolling emits per-layer grad
        # buffers instead, at the cost of a much longer compile; inference
        # keeps the scan (one compiled block, no grads to stack).
        for l in range(cfg.layers):
            xs_l = jax.tree.map(lambda a: a[l], xs)
            x, _ = body(x, xs_l)
    else:
        x, _ = jax.lax.scan(body, x, xs)

    if not cfg.global_average_pool:
        x = layer_norm(x, params["norm_w"], params["norm_b"], cfg.ln_eps)
        if return_all_features:
            return x
        return x[:, 0]
    # global_average_pool=True: identity norm + fc_norm(mean) pooling
    if return_all_features:
        return x
    return layer_norm(
        jnp.mean(x, axis=1), params["norm_w"], params["norm_b"], cfg.ln_eps
    )
