"""Audio encoders: AST and BEATs, TPU-native.

Capability parity:
  - AST (reference data/model/audio_encoders/ast/ast.py:1-201 +
    AudioSet-checkpoint remap data/model/general_module.py:257-314):
    16x16 conv patch embed on the spectrogram, CLS token, learned absolute
    positions, 12-layer prenorm transformer (eps 1e-12, erf-GELU).
  - BEATs (reference data/model/audio_encoders/beats/beats.py:272-1170,
    AS2M-checkpoint config): 16x16 conv patch embed → LN → 512→768
    projection, weight-normed grouped conv positional embedding
    (k=128, groups=16, SamePad trim, GELU), 12 post-norm layers with
    deep-norm residual scaling, T5-style bucketed relative position bias
    (num_buckets/max_distance, table shared from layer 0) with the gated
    (gru_rel_pos) per-layer modulation, and the max-subtracted ×32 softmax
    stabilisation (beats.py:877-917).

TPU-first: both are pure static-shape jit programs. The conv patch embeds
are patch-reshape + matmul (MXU); the positional conv is one
`lax.conv_general_dilated` with feature groups; the relative-position
bucket index is a host-precomputed constant per sequence length.

Training regularizers (dropout/attention-dropout/activation-dropout,
LayerDrop, layer-wise gradient decay — reference beats.py:292-318,406-530
and ast.py:55-100,200) activate when `train_rng` is passed; without it the
forwards are the exact golden-tested eval graphs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.ops.layers import dropout, gelu, layer_norm, linear

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AstConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    audio_melbins: int = 64
    audio_target_length: int = 1024
    patch_size: int = 16
    ln_eps: float = 1e-12
    # train-time regularizers (reference general_module.py:258-260 cfg)
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1

    @property
    def tokens_per_frame(self) -> int:
        return (self.audio_melbins // self.patch_size) * (
            self.audio_target_length // self.patch_size
        )


def _attention(p, x, num_heads, rng=None, attn_drop=0.0):
    b, n, c = x.shape
    hd = c // num_heads
    q = linear(x, p["q_w"], p["q_b"]).reshape(b, n, num_heads, hd)
    k = linear(x, p["k_w"], p["k_b"]).reshape(b, n, num_heads, hd)
    v = linear(x, p["v_w"], p["v_b"]).reshape(b, n, num_heads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    if rng is not None:
        # attention-map dropout (reference ast.py:112,128)
        attn = dropout(rng, attn_drop, attn)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
    return linear(out, p["o_w"], p["o_b"])


def ast_forward(
    params: Dict, cfg: AstConfig, spectrograms: jnp.ndarray,
    compute_dtype=jnp.float32, train_rng=None,
) -> jnp.ndarray:
    """(B, T, M) normalized fbank → (B, 1 + T/16·M/16, H) prenorm-LN output
    (reference ast.py:143-175 TransformerEncoder + :179-201 AudioEmbeddings;
    token order is conv's row-major (T-patches, M-patches)).

    train_rng activates the reference regularizers: embedding dropout
    (ast.py:200), residual dropout on both branches (ast.py:73-84) and
    attention-map dropout, all at the cfg rates (0.1/0.1)."""
    x = spectrograms.astype(compute_dtype)
    b, t, m = x.shape
    p = cfg.patch_size
    # conv k=16 s=16 on (B, 1, T, M) → row-major (T/16, M/16) tokens;
    # a non-multiple trailing edge is truncated (torch conv semantics)
    x = x[:, : t // p * p, : m // p * p]
    x = x.reshape(b, t // p, p, m // p, p)
    x = x.transpose(0, 1, 3, 2, 4).reshape(b, -1, p * p)
    x = linear(x, params["patch_w"], params["patch_b"])
    cls = jnp.broadcast_to(
        params["cls_token"].astype(x.dtype), (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None, : x.shape[1]]
    if train_rng is not None:
        train_rng, k_emb = jax.random.split(train_rng)
        x = dropout(k_emb, cfg.hidden_dropout, x)

    for lp in params["layers"]:
        k_attn = k_r1 = k_r2 = None
        if train_rng is not None:
            train_rng, k_attn, k_r1, k_r2 = jax.random.split(train_rng, 4)
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], cfg.ln_eps)
        h = _attention(lp, h, cfg.num_attention_heads,
                       rng=k_attn, attn_drop=cfg.attention_dropout)
        if train_rng is not None:
            h = dropout(k_r1, cfg.hidden_dropout, h)
        x = x + h
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.ln_eps)
        h = gelu(linear(h, lp["fc1_w"], lp["fc1_b"]))
        h = linear(h, lp["fc2_w"], lp["fc2_b"])
        if train_rng is not None:
            h = dropout(k_r2, cfg.hidden_dropout, h)
        x = x + h
    return layer_norm(
        x, params["last_ln_scale"], params["last_ln_bias"], cfg.ln_eps
    )


def init_ast(key, cfg: AstConfig) -> Dict:
    h, i = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, cfg.num_hidden_layers + 3)
    layers = []
    for li in range(cfg.num_hidden_layers):
        k = jax.random.split(ks[li], 6)
        layers.append({
            "q_w": jax.random.normal(k[0], (h, h)) * 0.02, "q_b": jnp.zeros((h,)),
            "k_w": jax.random.normal(k[1], (h, h)) * 0.02, "k_b": jnp.zeros((h,)),
            "v_w": jax.random.normal(k[2], (h, h)) * 0.02, "v_b": jnp.zeros((h,)),
            "o_w": jax.random.normal(k[3], (h, h)) * 0.02, "o_b": jnp.zeros((h,)),
            "ln1_scale": jnp.ones((h,)), "ln1_bias": jnp.zeros((h,)),
            "ln2_scale": jnp.ones((h,)), "ln2_bias": jnp.zeros((h,)),
            "fc1_w": jax.random.normal(k[4], (h, i)) * 0.02, "fc1_b": jnp.zeros((i,)),
            "fc2_w": jax.random.normal(k[5], (i, h)) * 0.02, "fc2_b": jnp.zeros((h,)),
        })
    return {
        "patch_w": jax.random.normal(ks[-3], (cfg.patch_size**2, h)) * 0.02,
        "patch_b": jnp.zeros((h,)),
        "cls_token": jax.random.normal(ks[-2], (1, h)) * 0.02,
        "pos_embed": jax.random.normal(ks[-1], (cfg.tokens_per_frame + 1, h))
        * 0.02,
        "layers": layers,
        "last_ln_scale": jnp.ones((h,)), "last_ln_bias": jnp.zeros((h,)),
    }


def ast_from_torch(sd: Dict, cfg: AstConfig) -> Dict:
    """Convert the VAST-layout AST state dict (audio_embeddings.* +
    audio_encoder.layer.N.* keys, data/model/general_module.py:275-310)."""
    g = lambda k: np.asarray(sd[k])
    conv = g("audio_embeddings.first_conv.weight")  # (H, 1, 16, 16)
    layers = []
    for i in range(cfg.num_hidden_layers):
        pfx = f"audio_encoder.layer.{i}."
        layers.append({
            "q_w": g(pfx + "attention.linears.0.weight").T,
            "q_b": g(pfx + "attention.linears.0.bias"),
            "k_w": g(pfx + "attention.linears.1.weight").T,
            "k_b": g(pfx + "attention.linears.1.bias"),
            "v_w": g(pfx + "attention.linears.2.weight").T,
            "v_b": g(pfx + "attention.linears.2.bias"),
            "o_w": g(pfx + "attention.linears.3.weight").T,
            "o_b": g(pfx + "attention.linears.3.bias"),
            "ln1_scale": g(pfx + "layernorm1.weight"),
            "ln1_bias": g(pfx + "layernorm1.bias"),
            "ln2_scale": g(pfx + "layernorm2.weight"),
            "ln2_bias": g(pfx + "layernorm2.bias"),
            "fc1_w": g(pfx + "ff_layer.linear1.weight").T,
            "fc1_b": g(pfx + "ff_layer.linear1.bias"),
            "fc2_w": g(pfx + "ff_layer.linear2.weight").T,
            "fc2_b": g(pfx + "ff_layer.linear2.bias"),
        })
    return jax.tree.map(jnp.asarray, {
        "patch_w": conv.reshape(conv.shape[0], -1).T,
        "patch_b": g("audio_embeddings.first_conv.bias"),
        "cls_token": g("audio_embeddings.cls_token").reshape(1, -1),
        "pos_embed": g("audio_embeddings.position_embeddings.weight"),
        "layers": layers,
        "last_ln_scale": g("audio_encoder.last_layernorm.weight"),
        "last_ln_bias": g("audio_encoder.last_layernorm.bias"),
    })


# ---------------------------------------------------------------------------
# BEATs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BeatsConfig:
    """Field names mirror the reference BEATsConfig (beats.py:1039-1077);
    defaults are the BEATs_iter3_plus_AS2M checkpoint settings."""

    input_patch_size: int = 16
    embed_dim: int = 512
    conv_bias: bool = False
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    activation_fn: str = "gelu"
    layer_norm_first: bool = False
    deep_norm: bool = True
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True
    ln_eps: float = 1e-5
    # train-time regularizers (reference BEATsConfig defaults,
    # beats.py:1055-1060; quant_noise is dead code — the reference encoder
    # never passes q_noise > 0 to its MultiheadAttention)
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    encoder_layerdrop: float = 0.0
    layer_wise_gradient_decay_ratio: float = 1.0

    @property
    def head_dim(self) -> int:
        return self.encoder_embed_dim // self.encoder_attention_heads

    @property
    def deep_norm_alpha(self) -> float:
        return (2 * self.encoder_layers) ** 0.25 if self.deep_norm else 1.0


@lru_cache(maxsize=16)
def _rel_bucket_index(n: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """T5 bidirectional relative-position buckets (beats.py:647-683)."""
    rel = np.arange(n)[None, :] - np.arange(n)[:, None]  # memory - context
    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return out + np.where(is_small, rel, large)


def _beats_attention(p, x, cfg: BeatsConfig, position_bias, rng=None):
    """(B, N, C); returns (out, position_bias). Numerics follow
    beats.py:770-918: q·scale/32, max-subtract, ×32, gated rel-pos bias.
    rng applies attention-probability dropout (beats.py dropout_module)."""
    b, n, c = x.shape
    h, hd = cfg.encoder_attention_heads, cfg.head_dim
    alpha = 32.0
    q = linear(x, p["q_w"], p["q_b"]) * (hd**-0.5) / alpha
    k = linear(x, p["k_w"], p["k_b"])
    v = linear(x, p["v_w"], p["v_b"])
    q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, h, hd).transpose(0, 2, 1, 3)

    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    attn = (attn - attn.max(axis=-1, keepdims=True)) * alpha

    if position_bias is not None:
        bias = position_bias[None]                    # (1, H, N, N)
        if cfg.gru_rel_pos:
            # gated modulation (beats.py:905-913): gates from q (un-scaled)
            ql = q * alpha / (hd**-0.5)
            gates = linear(ql, p["grep_w"], p["grep_b"])  # (B,H,N,8)
            gates = gates.reshape(b, h, n, 2, 4).sum(-1)
            gate_a, gate_b = jax.nn.sigmoid(gates[..., 0]), jax.nn.sigmoid(
                gates[..., 1]
            )
            gate = gate_a * (gate_b * p["grep_a"].reshape(1, h, 1) - 1.0) + 2.0
            bias = gate[..., None] * bias
        attn = attn + bias.astype(attn.dtype)

    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    if rng is not None:
        attn = dropout(rng, cfg.attention_dropout, attn)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return linear(out, p["o_w"], p["o_b"]), position_bias


def _pos_conv(p, x, cfg: BeatsConfig):
    """Weight-normed grouped conv1d positional embedding + SamePad + GELU
    (beats.py:279-292)."""
    # x: (B, N, C) → conv over N with C channels, groups
    w = p["pos_conv_w"]                     # (C_out, C_in/groups, K)
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32).transpose(0, 2, 1)[:, :, :],   # (B, C, N)
        jnp.asarray(w, jnp.float32),
        window_strides=(1,),
        padding=[(cfg.conv_pos // 2, cfg.conv_pos // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=cfg.conv_pos_groups,
    )
    out = out + p["pos_conv_b"].reshape(1, -1, 1)
    if cfg.conv_pos % 2 == 0:
        out = out[:, :, :-1]                # SamePad trim
    out = jax.nn.gelu(out, approximate=False)
    return out.transpose(0, 2, 1).astype(x.dtype)


def beats_forward(
    params: Dict, cfg: BeatsConfig, fbank: jnp.ndarray,
    compute_dtype=jnp.float32, train_rng=None,
) -> jnp.ndarray:
    """(B, T, M) normalized fbank → (B, T/16·M/16, encoder_embed_dim)
    (reference beats.py:1147-1169 forward).

    train_rng activates the reference training internals (beats.py:292-318,
    406-530): post-pos-conv dropout, per-layer attention-probability
    dropout, residual dropout (dropout1/dropout3), FFN activation dropout
    (dropout2), LayerDrop (no rescale, fairseq semantics), and the
    layer-wise gradient decay multiply (identity forward, grad × ratio per
    layer)."""
    x = fbank.astype(compute_dtype)
    b, t, m = x.shape
    ps = cfg.input_patch_size
    # conv k=s=16 truncates a non-multiple trailing edge (torch semantics)
    x = x[:, : t // ps * ps, : m // ps * ps]
    x = x.reshape(b, t // ps, ps, m // ps, ps)
    x = x.transpose(0, 1, 3, 2, 4).reshape(b, -1, ps * ps)
    x = linear(x, params["patch_w"], params.get("patch_b"))
    x = layer_norm(x, params["ln_scale"], params["ln_bias"], cfg.ln_eps)
    if "proj_w" in params:
        x = linear(x, params["proj_w"], params["proj_b"])

    x = x + _pos_conv(params, x, cfg)
    if not cfg.layer_norm_first:
        x = layer_norm(
            x, params["enc_ln_scale"], params["enc_ln_bias"], cfg.ln_eps
        )
    if train_rng is not None:
        train_rng, k_in = jax.random.split(train_rng)
        x = dropout(k_in, cfg.dropout, x)

    da = cfg.deep_norm_alpha
    decay = cfg.layer_wise_gradient_decay_ratio
    # the T5-bucketed relative bias table lives once at the top level (the
    # reference shares layer 0's nn.Embedding across layers, beats.py:325-328;
    # a single param avoids aliased leaves, which breaks buffer donation)
    position_bias = None
    if cfg.relative_position_embedding:
        n = x.shape[1]
        idx = _rel_bucket_index(n, cfg.num_buckets, cfg.max_distance)
        position_bias = params["rel_bias_table"][idx.reshape(-1)]
        position_bias = position_bias.reshape(
            n, n, cfg.encoder_attention_heads
        ).transpose(2, 0, 1)
    for lp in params["layers"]:
        k_attn = k_d1 = k_d2 = k_d3 = k_ld = None
        if train_rng is not None:
            train_rng, k_attn, k_d1, k_d2, k_d3, k_ld = jax.random.split(
                train_rng, 6
            )
            if decay != 1.0:
                # GradMultiply (beats.py:381-382): identity forward,
                # backward scales by the decay ratio, compounding per layer
                x = x * decay + jax.lax.stop_gradient(x * (1.0 - decay))
        x_in = x
        res = x
        h, position_bias = _beats_attention(lp, x, cfg, position_bias,
                                            rng=k_attn)
        if train_rng is not None:
            h = dropout(k_d1, cfg.dropout, h)
        x = res * da + h
        x = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], cfg.ln_eps)
        res = x
        h = gelu(linear(x, lp["fc1_w"], lp["fc1_b"]))
        if train_rng is not None:
            h = dropout(k_d2, cfg.activation_dropout, h)
        h = linear(h, lp["fc2_w"], lp["fc2_b"])
        if train_rng is not None:
            h = dropout(k_d3, cfg.dropout, h)
        x = res * da + h
        x = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.ln_eps)
        if train_rng is not None and cfg.encoder_layerdrop > 0.0:
            # fairseq LayerDrop: whole layer skipped, no rescale
            keep = jax.random.bernoulli(
                k_ld, 1.0 - cfg.encoder_layerdrop, ()
            )
            x = jnp.where(keep, x, x_in)
    return x


def init_beats(key, cfg: BeatsConfig) -> Dict:
    c, e = cfg.embed_dim, cfg.encoder_embed_dim
    h = cfg.encoder_attention_heads
    ks = jax.random.split(key, cfg.encoder_layers + 4)
    layers = []
    for li in range(cfg.encoder_layers):
        k = jax.random.split(ks[li], 8)
        lp = {
            "q_w": jax.random.normal(k[0], (e, e)) * 0.02, "q_b": jnp.zeros((e,)),
            "k_w": jax.random.normal(k[1], (e, e)) * 0.02, "k_b": jnp.zeros((e,)),
            "v_w": jax.random.normal(k[2], (e, e)) * 0.02, "v_b": jnp.zeros((e,)),
            "o_w": jax.random.normal(k[3], (e, e)) * 0.02, "o_b": jnp.zeros((e,)),
            "ln1_scale": jnp.ones((e,)), "ln1_bias": jnp.zeros((e,)),
            "ln2_scale": jnp.ones((e,)), "ln2_bias": jnp.zeros((e,)),
            "fc1_w": jax.random.normal(k[4], (e, cfg.encoder_ffn_embed_dim))
            * 0.02,
            "fc1_b": jnp.zeros((cfg.encoder_ffn_embed_dim,)),
            "fc2_w": jax.random.normal(k[5], (cfg.encoder_ffn_embed_dim, e))
            * 0.02,
            "fc2_b": jnp.zeros((e,)),
        }
        if cfg.gru_rel_pos:
            lp["grep_w"] = jax.random.normal(k[7], (cfg.head_dim, 8)) * 0.02
            lp["grep_b"] = jnp.zeros((8,))
            lp["grep_a"] = jnp.ones((h,))
        layers.append(lp)
    params = {
        "patch_w": jax.random.normal(ks[-4], (cfg.input_patch_size**2, c)) * 0.02,
        "ln_scale": jnp.ones((c,)), "ln_bias": jnp.zeros((c,)),
        "pos_conv_w": jax.random.normal(
            ks[-3], (e, e // cfg.conv_pos_groups, cfg.conv_pos)
        ) * 0.02,
        "pos_conv_b": jnp.zeros((e,)),
        "enc_ln_scale": jnp.ones((e,)), "enc_ln_bias": jnp.zeros((e,)),
        "layers": layers,
    }
    if cfg.relative_position_embedding:
        # single shared table (the reference shares layer 0's embedding
        # across all layers, beats.py:325-328)
        params["rel_bias_table"] = (
            jax.random.normal(ks[-1], (cfg.num_buckets, h)) * 0.02
        )
    if cfg.conv_bias:
        params["patch_b"] = jnp.zeros((c,))
    if c != e:
        params["proj_w"] = jax.random.normal(ks[-2], (c, e)) * 0.02
        params["proj_b"] = jnp.zeros((e,))
    return params


def beats_from_torch(sd: Dict, cfg: BeatsConfig) -> Dict:
    """Convert the released BEATs state dict (checkpoint['model'] layout)."""
    g = lambda k: np.asarray(sd[k])
    conv = g("patch_embedding.weight")          # (C, 1, 16, 16)
    # weight-normed pos conv: weight = g * v / ||v|| over dims (0,1), per k
    wv = g("encoder.pos_conv.0.weight_v")       # (C, C/groups, K)
    wg = g("encoder.pos_conv.0.weight_g")       # (1, 1, K)
    norm = np.sqrt((wv**2).sum(axis=(0, 1), keepdims=True))
    pos_w = wg * wv / np.maximum(norm, 1e-12)
    layers = []
    for i in range(cfg.encoder_layers):
        pfx = f"encoder.layers.{i}."
        lp = {
            "q_w": g(pfx + "self_attn.q_proj.weight").T,
            "q_b": g(pfx + "self_attn.q_proj.bias"),
            "k_w": g(pfx + "self_attn.k_proj.weight").T,
            "k_b": g(pfx + "self_attn.k_proj.bias")
            if pfx + "self_attn.k_proj.bias" in sd else np.zeros(
                (cfg.encoder_embed_dim,), np.float32),
            "v_w": g(pfx + "self_attn.v_proj.weight").T,
            "v_b": g(pfx + "self_attn.v_proj.bias"),
            "o_w": g(pfx + "self_attn.out_proj.weight").T,
            "o_b": g(pfx + "self_attn.out_proj.bias"),
            "ln1_scale": g(pfx + "self_attn_layer_norm.weight"),
            "ln1_bias": g(pfx + "self_attn_layer_norm.bias"),
            "ln2_scale": g(pfx + "final_layer_norm.weight"),
            "ln2_bias": g(pfx + "final_layer_norm.bias"),
            "fc1_w": g(pfx + "fc1.weight").T, "fc1_b": g(pfx + "fc1.bias"),
            "fc2_w": g(pfx + "fc2.weight").T, "fc2_b": g(pfx + "fc2.bias"),
        }
        if cfg.gru_rel_pos:
            lp["grep_w"] = g(pfx + "self_attn.grep_linear.weight").T
            lp["grep_b"] = g(pfx + "self_attn.grep_linear.bias")
            lp["grep_a"] = g(pfx + "self_attn.grep_a").reshape(-1)
        layers.append(lp)
    params = {
        "patch_w": conv.reshape(conv.shape[0], -1).T,
        "ln_scale": g("layer_norm.weight"), "ln_bias": g("layer_norm.bias"),
        "pos_conv_w": pos_w, "pos_conv_b": g("encoder.pos_conv.0.bias"),
        "enc_ln_scale": g("encoder.layer_norm.weight"),
        "enc_ln_bias": g("encoder.layer_norm.bias"),
        "layers": layers,
    }
    if cfg.relative_position_embedding:
        params["rel_bias_table"] = g(
            "encoder.layers.0.self_attn.relative_attention_bias.weight"
        )
    if "patch_embedding.bias" in sd:
        params["patch_b"] = g("patch_embedding.bias")
    if "post_extract_proj.weight" in sd:
        params["proj_w"] = g("post_extract_proj.weight").T
        params["proj_b"] = g("post_extract_proj.bias")
    return jax.tree.map(jnp.asarray, params)
