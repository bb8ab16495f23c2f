"""BERT-base interface branch with cross-attention, TPU-native.

Functional re-design of the reference HF-forked BERT (model/bert.py):
  - embeddings: word + absolute position + token-type, LN eps 1e-12
    (model/bert.py:81-149)
  - 12 layers: self-attn → (optional) cross-attn over `encoder_hidden_states`
    → FFN-GELU, each sublayer residual + LN (model/bert.py:378-461)
  - mask semantics (model/bert.py:697-781): 2D (b, L) padding masks stay
    BIDIRECTIONAL (the reference comments out the causal branch); 3D
    (b, L, L) masks pass through; additive value (1-m) * -10000.
    Cross-attention mask is all-ones by default.
  - MLM head: dense → GELU → LN → decoder(+bias) (model/bert.py:575-610);
    forward returns (loss, logits, sequence_output) like the reference edict
    (model/bert.py:1093-1097)

TPU-first: layers run under a single lax.scan over stacked params; attention
is the Pallas flash kernel with fp32 softmax; loss masking uses -100 labels
exactly like torch CrossEntropyLoss(ignore_index=-100).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mico_tpu.config import BertConfig
from mico_tpu.ops.attention import multi_head_attention
from mico_tpu.ops.layers import dropout, gelu, layer_norm, linear

MASK_VALUE = -10000.0


class BertOutput(NamedTuple):
    loss: Optional[jnp.ndarray]
    logits: Optional[jnp.ndarray]
    sequence_output: jnp.ndarray


def init_bert(key: jax.Array, cfg: BertConfig) -> dict:
    """Random init (normal 0.02, zero bias/LN-bias, unit LN) matching the
    reference `_init_weights` (model/mico.py:65-79)."""
    d, h, inter = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    enc = cfg.encoder_width
    ks = iter(jax.random.split(key, 40))
    rnd = lambda shape: 0.02 * jax.random.normal(next(ks), shape, jnp.float32)

    layers = {
        "q_w": rnd((d, h, h)), "q_b": jnp.zeros((d, h)),
        "k_w": rnd((d, h, h)), "k_b": jnp.zeros((d, h)),
        "v_w": rnd((d, h, h)), "v_b": jnp.zeros((d, h)),
        "attn_out_w": rnd((d, h, h)), "attn_out_b": jnp.zeros((d, h)),
        "attn_ln_w": jnp.ones((d, h)), "attn_ln_b": jnp.zeros((d, h)),
        "inter_w": rnd((d, h, inter)), "inter_b": jnp.zeros((d, inter)),
        "out_w": rnd((d, inter, h)), "out_b": jnp.zeros((d, h)),
        "out_ln_w": jnp.ones((d, h)), "out_ln_b": jnp.zeros((d, h)),
    }
    if cfg.add_cross_attention:
        layers.update(
            xq_w=rnd((d, h, h)), xq_b=jnp.zeros((d, h)),
            xk_w=rnd((d, enc, h)), xk_b=jnp.zeros((d, h)),
            xv_w=rnd((d, enc, h)), xv_b=jnp.zeros((d, h)),
            x_out_w=rnd((d, h, h)), x_out_b=jnp.zeros((d, h)),
            x_ln_w=jnp.ones((d, h)), x_ln_b=jnp.zeros((d, h)),
        )
    return {
        "embeddings": {
            "word": rnd((cfg.vocab_size, h)),
            "position": rnd((cfg.max_position_embeddings, h)),
            "token_type": rnd((cfg.type_vocab_size, h)),
            "ln_w": jnp.ones((h,)), "ln_b": jnp.zeros((h,)),
        },
        "layers": layers,
        "mlm_head": {
            "dense_w": rnd((h, h)), "dense_b": jnp.zeros((h,)),
            "ln_w": jnp.ones((h,)), "ln_b": jnp.zeros((h,)),
            "decoder_w": rnd((h, cfg.vocab_size)),
            "decoder_b": jnp.zeros((cfg.vocab_size,)),
        },
    }


def extended_attention_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """(b, L) or (b, Lq, Lk) 1/0 mask → additive (b, 1, Lq|1, Lk) fp32.

    Mirrors model/bert.py:697-781: 2D masks are pure padding masks (no
    causal augmentation — that branch is commented out in the reference);
    3D masks broadcast over heads."""
    if attention_mask.ndim == 2:
        ext = attention_mask[:, None, None, :]
    elif attention_mask.ndim == 3:
        ext = attention_mask[:, None, :, :]
    else:
        raise ValueError(f"bad mask rank {attention_mask.ndim}")
    return (1.0 - ext.astype(jnp.float32)) * MASK_VALUE


def bert_embeddings(
    params: dict,
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    position_ids: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    train_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    b, l = input_ids.shape
    if position_ids is None:
        position_ids = jnp.arange(l, dtype=jnp.int32)[None, :]
    x = jnp.take(params["word"], input_ids, axis=0)
    x = x + jnp.take(params["position"], position_ids, axis=0)
    if token_type_ids is None:
        x = x + params["token_type"][0]
    else:
        x = x + jnp.take(params["token_type"], token_type_ids, axis=0)
    x = layer_norm(x, params["ln_w"], params["ln_b"], cfg.layer_norm_eps)
    # training: embedding dropout after LN (model/bert.py:93,147)
    x = dropout(train_rng, cfg.hidden_dropout_prob, x)
    return x.astype(compute_dtype)


def _attn_sublayer(
    x: jnp.ndarray,
    kv: jnp.ndarray,
    lp: dict,
    cfg: BertConfig,
    bias: Optional[jnp.ndarray],
    prefix: str,
    out_prefix: str,
    ln_prefix: str,
    attn_impl: str,
    train_rng: Optional[jax.Array] = None,
    kv_index: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    b, lq, h = x.shape
    u, lk = kv.shape[0], kv.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    probs_rng = out_rng = None
    if train_rng is not None:
        probs_rng, out_rng = jax.random.split(train_rng)
    q = linear(x, lp[f"{prefix}q_w"], lp[f"{prefix}q_b"])
    # kv may carry only the UNIQUE condition rows (u < b) with kv_index
    # mapping each query row to its condition row: K/V are projected once
    # per unique row and gathered, which is exactly project-after-gather
    # (each output element is the same dot product) at 1/duplication the
    # projection FLOPs. Used by the ITM 3×bs pass whose three row groups
    # share the same per-sample conditions (vast.py:419-457).
    k = linear(kv, lp[f"{prefix}k_w"], lp[f"{prefix}k_b"])
    v = linear(kv, lp[f"{prefix}v_w"], lp[f"{prefix}v_b"])
    q = q.reshape(b, lq, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(u, lk, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(u, lk, nh, hd).transpose(0, 2, 1, 3)
    if kv_index is not None:
        k = jnp.take(k, kv_index, axis=0)
        v = jnp.take(v, kv_index, axis=0)
    o = multi_head_attention(
        q, k, v, bias=bias, scale=hd**-0.5, impl=attn_impl,
        dropout_rng=probs_rng,
        dropout_rate=cfg.attention_probs_dropout_prob,
    )
    o = o.transpose(0, 2, 1, 3).reshape(b, lq, h)
    o = linear(o, lp[f"{out_prefix}_w"], lp[f"{out_prefix}_b"])
    # training: output dropout before the residual+LN (model/bert.py:291,369)
    o = dropout(out_rng, cfg.hidden_dropout_prob, o)
    return layer_norm(
        x + o, lp[f"{ln_prefix}_w"], lp[f"{ln_prefix}_b"], cfg.layer_norm_eps
    )


# A/B knob (scripts/train_bench.py --bert-unroll): python-unroll the
# 12-layer march instead of lax.scan over stacked params. Measured on the
# production mix before any default change — see BASELINE.md round 4.
BERT_UNROLL = False


def bert_encoder(
    params: dict,
    cfg: BertConfig,
    hidden: jnp.ndarray,
    self_bias: Optional[jnp.ndarray],
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    cross_bias: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    train_rng: Optional[jax.Array] = None,
    cross_kv_index: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    has_cross = encoder_hidden_states is not None

    def body(x, xs):
        lp, key = xs
        k_self = k_cross = k_ffn = None
        if key is not None:
            k_self, k_cross, k_ffn = jax.random.split(key, 3)
        x = _attn_sublayer(
            x, x, lp, cfg, self_bias, "", "attn_out", "attn_ln", attn_impl,
            train_rng=k_self,
        )
        if has_cross:
            x = _attn_sublayer(
                x, encoder_hidden_states.astype(x.dtype), lp, cfg,
                cross_bias, "x", "x_out", "x_ln", attn_impl,
                train_rng=k_cross, kv_index=cross_kv_index,
            )
        y = gelu(linear(x, lp["inter_w"], lp["inter_b"]))
        y = linear(y, lp["out_w"], lp["out_b"])
        # training: FFN output dropout before residual+LN (model/bert.py:369)
        y = dropout(k_ffn, cfg.hidden_dropout_prob, y)
        x = layer_norm(
            x + y, lp["out_ln_w"], lp["out_ln_b"], cfg.layer_norm_eps
        )
        return x, None

    layer_keys = (
        None if train_rng is None
        else jax.random.split(train_rng, cfg.num_hidden_layers)
    )
    if remat:
        body = jax.checkpoint(body)
    if BERT_UNROLL:
        # A/B route (train_bench --bert-unroll): python-unrolled march
        # emits per-layer weight-grad buffers instead of the scan
        # backward's stacked-buffer update-slice copies — at BERT-base's
        # small layers the stacked copies are proportionally larger than
        # at ViT-g scale (where the scan measured faster, BASELINE rnd 3)
        x = hidden
        for l in range(cfg.num_hidden_layers):
            lp = jax.tree.map(lambda a: a[l], params["layers"])
            key_l = None if layer_keys is None else layer_keys[l]
            x, _ = body(x, (lp, key_l))
        return x
    out, _ = jax.lax.scan(body, hidden, (params["layers"], layer_keys))
    return out


def mlm_logits(params: dict, cfg: BertConfig, sequence_output: jnp.ndarray) -> jnp.ndarray:
    hp = params["mlm_head"]
    x = gelu(linear(sequence_output, hp["dense_w"], hp["dense_b"]))
    x = layer_norm(x, hp["ln_w"], hp["ln_b"], cfg.layer_norm_eps)
    return linear(x, hp["decoder_w"], hp["decoder_b"])


def mlm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over labels != -100 (torch CrossEntropyLoss ignore_index)."""
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def bert_forward(
    params: dict,
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    encoder_attention_mask: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "auto",
    remat: bool = False,
    with_logits: bool = False,
    train_rng: Optional[jax.Array] = None,
    encoder_row_index: Optional[jnp.ndarray] = None,
) -> BertOutput:
    """The `BertForMaskedLM.forward` equivalent
    (model/bert.py:1047-1097; returns loss/logits/sequence_output).

    train_rng: when given, training-time dropout runs — hidden dropout 0.1
    on embeddings / attention outputs / FFN outputs and attention-probs
    dropout 0.1, matching the reference config
    (model/bert-base-uncased-crossattn/config.json:7,11 and
    model/bert.py:93,169,291,369). None = eval, exact no-dropout parity."""
    self_bias = extended_attention_mask(attention_mask)
    cross_bias = None
    if encoder_hidden_states is not None and encoder_attention_mask is not None:
        enc_mask = encoder_attention_mask
        if encoder_row_index is not None:
            # contract: with a row index, encoder_hidden_states holds the
            # UNIQUE condition rows and the mask must be given per unique
            # row too — always expanded to query rows here (no shape-based
            # inference; a per-query mask would be silently mis-gathered)
            assert enc_mask.shape[0] == encoder_hidden_states.shape[0], (
                f"encoder_attention_mask must be per-unique-row "
                f"({encoder_hidden_states.shape[0]}) when encoder_row_index "
                f"is given, got {enc_mask.shape[0]}"
            )
            enc_mask = jnp.take(enc_mask, encoder_row_index, axis=0)
        cross_bias = extended_attention_mask(enc_mask)
    k_emb = k_enc = None
    if train_rng is not None:
        k_emb, k_enc = jax.random.split(train_rng)
    hidden = bert_embeddings(
        params["embeddings"], cfg, input_ids, position_ids, token_type_ids,
        compute_dtype=compute_dtype, train_rng=k_emb,
    )
    seq = bert_encoder(
        params, cfg, hidden, self_bias, encoder_hidden_states, cross_bias,
        attn_impl=attn_impl, remat=remat, train_rng=k_enc,
        cross_kv_index=encoder_row_index,
    )
    logits = None
    loss = None
    if labels is not None or with_logits:
        logits = mlm_logits(params, cfg, seq)
        if labels is not None:
            loss = mlm_loss(logits, labels)
    return BertOutput(loss=loss, logits=logits, sequence_output=seq)
