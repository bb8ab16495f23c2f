"""Fixed-shape caption generation for the BERT interface branch.

The reference generates with HF `generate` plus a custom trick
(model/bert.py:1110-1143): each step appends a [MASK] dummy token, grows a 3D
attention mask whose new row copies the previous row and attends itself, and
reads the logits at the [MASK] slot to pick the next real token.

Key observation for the TPU re-design: that grown mask IS a causal mask —
row i attends exactly to positions 0..i. Under a causal mask, rows ≤ t are
unaffected by anything written at positions > t, so we can run the whole
decode over one fixed-length token buffer with one static lower-triangular
mask, writing token t at buffer slot t+1 and reading logits at the [MASK]
slot — no per-step shape growth, fully jit/scan compatible.

Implements greedy, top-k sampling (the VAST captioner mode,
data/model/vast.py:521-537) and beam search with HF's length penalty
(score = logp_sum / len**penalty; demo uses penalty 0.6,
inference_demo.py:164-171).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.config import (
    BERT_CLS_ID,
    BERT_MASK_ID,
    BERT_PAD_ID,
    BERT_SEP_ID,
    BertConfig,
)
from mico_tpu.models.bert import (
    bert_embeddings,
    bert_encoder,
    extended_attention_mask,
    mlm_logits,
)
from mico_tpu.ops.layers import gelu, layer_norm, linear

NEG_INF = -1.0e7


def _part_causal_mask(
    l: int, prefix_mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """(B|1, L, L) mask: with no prefix, plain lower-triangular. With a
    prefix of length Lq (from prefix_mask's width): prefix rows attend the
    prefix bidirectionally and never the generated part; generated rows
    attend valid prefix positions plus themselves causally — the reference's
    part-causal QA mask (data/model/vast.py:595-600) extended stepwise."""
    causal = jnp.tril(jnp.ones((1, l, l), jnp.float32))
    if prefix_mask is None:
        return causal
    lq = prefix_mask.shape[1]
    col = jnp.arange(l)[None, None, :]
    row = jnp.arange(l)[None, :, None]
    prefix_cols = jnp.pad(
        prefix_mask.astype(jnp.float32), ((0, 0), (0, l - lq))
    )[:, None, :]                                   # (B,1,L): valid prefix cols
    in_prefix_col = (col < lq).astype(jnp.float32)
    gen_row = (row >= lq).astype(jnp.float32)
    # prefix rows: prefix_cols only; gen rows: prefix_cols + causal gen cols
    mask = prefix_cols * in_prefix_col + gen_row * causal * (1.0 - in_prefix_col)
    return mask


def _decode_logits(
    params: dict,
    cfg: BertConfig,
    tokens: jnp.ndarray,          # (B, L) with [MASK] at slot t+1
    slot: jnp.ndarray,            # scalar: position of the [MASK]
    cond: jnp.ndarray,            # (B, Lk, H)
    cond_bias: Optional[jnp.ndarray],
    compute_dtype,
    prefix_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One decoder forward; returns fp32 logits (B, V) at `slot`."""
    b, l = tokens.shape
    self_bias = extended_attention_mask(_part_causal_mask(l, prefix_mask))
    hidden = bert_embeddings(
        params["embeddings"], cfg, tokens, compute_dtype=compute_dtype
    )
    seq = bert_encoder(
        params, cfg, hidden, self_bias, cond, cond_bias, attn_impl="auto"
    )
    row = jax.lax.dynamic_slice_in_dim(seq, slot, 1, axis=1)  # (B, 1, H)
    return mlm_logits(params, cfg, row)[:, 0].astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "mode", "num_beams", "top_k",
        "length_penalty", "compute_dtype", "use_cache", "int8_cross_kv",
    ),
)
def generate(
    params: dict,
    cfg: BertConfig,
    condition_feat: jnp.ndarray,
    *,
    max_new_tokens: int = 40,
    mode: str = "beam",            # 'greedy' | 'sample' | 'beam'
    num_beams: int = 3,
    top_k: int = 10,
    length_penalty: float = 0.6,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    use_cache: bool = True,
    int8_cross_kv: bool = False,
) -> jnp.ndarray:
    """→ (B, max_new_tokens + 1) token ids starting with [CLS]; generated
    tokens padded with [PAD] after [SEP].

    All modes run on the KV-cached incremental path by default
    (output-identical, ~3x per-batch decode throughput); use_cache=False
    keeps the literal recompute loop."""
    if mode == "beam":
        if use_cache:
            return cached_beam_generate(
                params, cfg, condition_feat, max_new_tokens=max_new_tokens,
                num_beams=num_beams, length_penalty=length_penalty,
                compute_dtype=compute_dtype, int8_cross_kv=int8_cross_kv,
            )
        return _beam_generate(
            params, cfg, condition_feat, max_new_tokens, num_beams,
            length_penalty, compute_dtype,
        )
    if use_cache:
        return cached_generate(
            params, cfg, condition_feat, max_new_tokens=max_new_tokens,
            mode=mode, top_k=top_k, rng=rng, compute_dtype=compute_dtype,
            int8_cross_kv=int8_cross_kv,
        )
    return _sequential_generate(
        params, cfg, condition_feat, max_new_tokens, mode, top_k, rng,
        compute_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "mode", "num_beams", "top_k",
        "length_penalty", "compute_dtype", "use_cache", "int8_cross_kv",
    ),
)
def generate_answers(
    params: dict,
    cfg: BertConfig,
    question_ids: jnp.ndarray,     # (B, Lq) padded question tokens
    question_mask: jnp.ndarray,    # (B, Lq)
    condition_feat: jnp.ndarray,
    *,
    max_new_tokens: int = 10,
    mode: str = "beam",
    num_beams: int = 3,
    top_k: int = 10,
    # the reference QA generate passes no length_penalty → HF default 1.0
    # (data/model/vast.py:637-643; caption decode is the one that passes 0.6)
    length_penalty: float = 1.0,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    use_cache: bool = True,
    int8_cross_kv: bool = False,
) -> jnp.ndarray:
    """QA decoding: question prefix encoded bidirectionally, answer decoded
    causally after a [CLS] (the reference part-causal mask + generate flow,
    data/model/vast.py:617-650). → (B, max_new_tokens + 1) starting [CLS].

    All modes run KV-cached (prefix prefilled once) when use_cache."""
    if mode == "beam":
        if use_cache:
            return cached_beam_generate(
                params, cfg, condition_feat, max_new_tokens=max_new_tokens,
                num_beams=num_beams, length_penalty=length_penalty,
                compute_dtype=compute_dtype,
                prefix_ids=question_ids, prefix_mask=question_mask,
                int8_cross_kv=int8_cross_kv,
            )
        return _beam_generate(
            params, cfg, condition_feat, max_new_tokens, num_beams,
            length_penalty, compute_dtype,
            prefix_ids=question_ids, prefix_mask=question_mask,
        )
    if use_cache:
        return cached_generate_answers(
            params, cfg, question_ids, question_mask, condition_feat,
            max_new_tokens=max_new_tokens, mode=mode, top_k=top_k, rng=rng,
            compute_dtype=compute_dtype, int8_cross_kv=int8_cross_kv,
        )
    return _sequential_generate(
        params, cfg, condition_feat, max_new_tokens, mode, top_k, rng,
        compute_dtype, prefix_ids=question_ids, prefix_mask=question_mask,
    )


def _sequential_generate(
    params, cfg, cond, max_new, mode, top_k, rng, compute_dtype,
    prefix_ids=None, prefix_mask=None,
):
    b = cond.shape[0]
    lq = 0 if prefix_ids is None else prefix_ids.shape[1]
    l = lq + max_new + 2               # [prefix] [CLS] + max_new + [MASK] slot
    tokens0 = jnp.full((b, l), BERT_PAD_ID, jnp.int32)
    if prefix_ids is not None:
        tokens0 = tokens0.at[:, :lq].set(prefix_ids)
    tokens0 = tokens0.at[:, lq].set(BERT_CLS_ID)
    finished0 = jnp.zeros((b,), bool)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, t):
        tokens, finished, key = carry
        probe = tokens.at[:, lq + t + 1].set(BERT_MASK_ID)
        logits = _decode_logits(
            params, cfg, probe, lq + t + 1, cond, None, compute_dtype,
            prefix_mask=prefix_mask,
        )
        if mode == "greedy":
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            key, sub = jax.random.split(key)
            vals, idx = jax.lax.top_k(logits, top_k)
            choice = jax.random.categorical(sub, vals)
            nxt = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
            nxt = nxt.astype(jnp.int32)
        nxt = jnp.where(finished, BERT_PAD_ID, nxt)
        tokens = tokens.at[:, lq + t + 1].set(nxt)
        finished = finished | (nxt == BERT_SEP_ID)
        return (tokens, finished, key), None

    (tokens, _, _), _ = jax.lax.scan(
        step, (tokens0, finished0, rng), jnp.arange(max_new)
    )
    return tokens[:, lq : lq + max_new + 1]


# ---------------------------------------------------------------------------
# KV-cached incremental decoding
# ---------------------------------------------------------------------------
#
# The recompute path above re-encodes the whole token buffer every step —
# faithful to the reference's [MASK]-append loop, but O(steps · L) decoder
# token-passes. The cached path is the TPU-native redesign: cross-attention
# K/V are projected ONCE from the condition features, self-attention K/V
# accumulate in per-layer caches via dynamic_update_slice, and each step
# runs the decoder over exactly TWO positions — the newly committed token
# (which writes the cache) and the [MASK] probe (which never does, because
# its slot will hold the real token next step). Identical outputs to the
# recompute path; one compiled program per geometry.


def _cross_mha(q, k, v, cfg):
    """Plain MHA (no bias) on (B, Lq, H) x cross K/V stored either packed
    (B, Lk, H) or split-heads (B, nh, Lk, hd) — see CROSS_KV_SPLIT_HEADS.
    Identical math either way (the split is an exact transpose)."""
    b, lq, h = q.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    qh = q.reshape(b, lq, nh, hd).transpose(0, 2, 1, 3)
    if k.ndim == 4:
        kh, vh = k, v
    else:
        lk = k.shape[1]
        kh = k.reshape(b, lk, nh, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, lk, nh, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, lq, h)


def _cached_layer_step(x, lp, ck, cv, xk, xv, t, cfg, self_bias, n_rep=1,
                       group_bias=None):
    """One decoder layer over the (B, 2, H) [committed, probe] pair.

    ck/cv: (B, S, H) self K/V caches whose LAST slot (index S-1) is the
    preallocated probe position — the probe K/V is dynamic-update-sliced
    into it in place each step instead of being concatenated (the concat
    materialized a full cache copy per layer per step). xk/xv:
    (B/n_rep, Lk, H) cross K/V — with n_rep > 1 (beam search) the cross
    K/V stay per batch element and the beams fold into the query rows, so
    the big condition projections are never replicated per beam.

    group_bias (beam search): additive f32 mask
    (B/n_rep, kq, 2, kc, S) that routes self-attention through the
    ancestry-masked in-group cross-product — every query beam kq attends
    to every cache row kc of its group, and the bias keeps exactly the
    positions owned by kq's ancestor chain. This removes the per-step
    physical cache regather entirely (ablated at 3.4 ms/step at the
    deployment shape); the caches stay append-only per physical row.
    Returns (x, updated ck, updated cv)."""
    b, _, h = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    def mha(q, k, v, bias):
        lq, lk = q.shape[1], k.shape[1]
        qh = q.reshape(b, lq, nh, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, lk, nh, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, lk, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        if bias is not None:
            s = s + bias
        p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        return o.transpose(0, 2, 1, 3).reshape(b, lq, h)

    def group_mha(q, k, v, bias):
        # beam self-attention without cache regather: (bg, kq, 2) queries x
        # (bg, kc, S) keys, softmax over the flattened (kc, S) axes with the
        # ancestry mask selecting each query's own lineage.
        # (A pre-flattened (kc·S) 4D formulation — identical math, less
        # score-tensor lane padding on paper — measured SLOWER on v5e
        # round 4: beam 16.20 vs 15.20 ms/step. The 6D einsums stay.)
        bg = b // n_rep
        S = k.shape[1]
        qh = q.reshape(bg, n_rep, 2, nh, hd)
        kh = k.reshape(bg, n_rep, S, nh, hd)
        vh = v.reshape(bg, n_rep, S, nh, hd)
        s = jnp.einsum(
            "bqxnd,bcsnd->bnqxcs", qh, kh,
            preferred_element_type=jnp.float32,
        ) * (hd**-0.5)
        s = s + bias[:, None]                     # (bg, nh, kq, 2, kc, S)
        p = jax.nn.softmax(
            s.reshape(bg, nh, n_rep, 2, n_rep * S), axis=-1
        ).reshape(bg, nh, n_rep, 2, n_rep, S).astype(vh.dtype)
        o = jnp.einsum("bnqxcs,bcsnd->bqxnd", p, vh)
        return o.reshape(b, 2, h)

    # self-attention: commit position t's K/V in place, probe K/V into the
    # preallocated last slot (both in-place updates — no cache copy)
    q = linear(x, lp["q_w"], lp["q_b"])
    k_new = linear(x, lp["k_w"], lp["k_b"])
    v_new = linear(x, lp["v_w"], lp["v_b"])
    S = ck.shape[1]
    ck = jax.lax.dynamic_update_slice(ck, k_new[:, :1], (0, t, 0))
    cv = jax.lax.dynamic_update_slice(cv, v_new[:, :1], (0, t, 0))
    ck = jax.lax.dynamic_update_slice(ck, k_new[:, 1:], (0, S - 1, 0))
    cv = jax.lax.dynamic_update_slice(cv, v_new[:, 1:], (0, S - 1, 0))
    if group_bias is not None:
        o = group_mha(q, ck, cv, group_bias)
    else:
        o = mha(q, ck, cv, self_bias)
    x = layer_norm(
        x + linear(o, lp["attn_out_w"], lp["attn_out_b"]),
        lp["attn_ln_w"], lp["attn_ln_b"], cfg.layer_norm_eps,
    )
    # cross-attention over the precomputed condition K/V. An (int8, scales)
    # tuple routes to the dequant-fused Pallas kernel (ops/int8_attention) —
    # the HBM stream that dominates the decode step halves
    def cross(q2):
        if isinstance(xk, tuple):
            from mico_tpu.ops.int8_attention import int8_cross_attention

            return int8_cross_attention(
                q2, xk[0], xk[1], xv[0], xv[1], cfg.num_attention_heads
            )
        return _cross_mha(q2, xk, xv, cfg)

    xq = linear(x, lp["xq_w"], lp["xq_b"])
    if n_rep > 1:
        lq = xq.shape[1]
        xq = xq.reshape(b // n_rep, n_rep * lq, h)
        o = cross(xq).reshape(b, lq, h)
    else:
        o = cross(xq)
    x = layer_norm(
        x + linear(o, lp["x_out_w"], lp["x_out_b"]),
        lp["x_ln_w"], lp["x_ln_b"], cfg.layer_norm_eps,
    )
    y = gelu(linear(x, lp["inter_w"], lp["inter_b"]))
    x = layer_norm(
        x + linear(y, lp["out_w"], lp["out_b"]),
        lp["out_ln_w"], lp["out_ln_b"], cfg.layer_norm_eps,
    )
    return x, ck, cv


def _cross_kv(params, cond):
    """Project the condition features through every layer's cross K/V once.
    → (layers, B, Lk, H) each."""
    lp = params["layers"]

    def proj(w, bias):  # w: (layers, enc, H)
        return jnp.einsum("bld,ndh->nblh", cond, w) + bias[:, None, None, :]

    return proj(lp["xk_w"], lp["xk_b"]), proj(lp["xv_w"], lp["xv_b"])


def _unstack(a, n):
    """Stacked (layers, ...) array → tuple of per-layer arrays (one-time
    copy at setup instead of a dynamic-slice copy per layer per step).

    The optimization_barrier pins each per-layer slice as its own buffer
    before the decode while-loop. Measured NEUTRAL on v5e round 4 (beam
    15.20 vs 15.21 ms/step): the 24 per-step `slice-start` DMA streams in
    the trace are the attention fusions' overlapped cross-K/V reads
    (~0.25 ms ≈ 200 MB each, at HBM bandwidth), not rematerialized
    copies — kept as a guard against XLA re-fusing the slices into the
    loop."""
    return jax.lax.optimization_barrier(tuple(a[l] for l in range(n)))


def _unrolled_layers(x, params, ck, cv, xk, xv, t, cfg, bias, n_rep=1,
                     group_bias=None):
    """Python-unrolled decoder layer stack for the cached decode step.

    ck/cv/xk/xv are TUPLES of per-layer arrays, not stacked (layers, ...)
    arrays marched by lax.scan: at the captioner shape each layer's cross
    K/V is (64, 2056, 768) ≈ 200 MB bf16, and a scan over layers
    dynamic-slices (= copies) both out of HBM every layer of every decode
    step — profiled at ~43% of the whole beam batch. As loop-invariant
    closure constants indexed statically they are read in place by the
    attention fusions instead. Returns (x, new_ck, new_cv) tuples."""
    new_ck, new_cv = [], []
    layers = params["layers"]
    for l in range(cfg.num_hidden_layers):
        lp = jax.tree.map(lambda a: a[l], layers)
        x, ckl, cvl = _cached_layer_step(
            x, lp, ck[l], cv[l], xk[l], xv[l], t, cfg, bias, n_rep,
            group_bias=group_bias,
        )
        new_ck.append(ckl)
        new_cv.append(cvl)
    return x, tuple(new_ck), tuple(new_cv)


# Store the per-layer cross K/V split per head — (B, nh, Lk, hd) row-major,
# so each attention fusion's (batch, head) stream reads its Lk x hd panel
# CONTIGUOUSLY instead of strided across the packed (B, Lk, nh*hd) hidden
# dim. Round-4's trace attributed the beam decode's residual +1.2 ms/step
# to the cross-read DMA running ~27% slower per stream at the same bytes
# (k-folded query layout); this is the layout-restoring attempt VERDICT #7
# asks to measure. Exactness: pure transpose, outputs bit-identical
# (tests/test_generation.py). Measured on v5e round 5 — see BASELINE.
CROSS_KV_SPLIT_HEADS = False


def _maybe_split_heads(x_tuple, cfg, enable):
    """Per-layer (B, Lk, H) tuples → (B, nh, Lk, hd), materialized once at
    setup (loop-invariant), barriered so XLA can't re-fuse the transpose
    into the decode loop."""
    if not enable:
        return x_tuple
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    def sp(a):
        b, lk, _ = a.shape
        return a.reshape(b, lk, nh, hd).transpose(0, 2, 1, 3)

    return jax.lax.optimization_barrier(tuple(sp(a) for a in x_tuple))


def _maybe_quantize_cross(xk, xv, cfg, enable):
    """Optionally int8-quantize the per-layer cross K/V tuples (the decode
    step's dominant HBM stream — ops/int8_attention). Each layer entry
    becomes an (int8 values, fp32 scales) pair that _cached_layer_step
    routes to the dequant-fused kernel."""
    if not enable:
        return xk, xv
    from mico_tpu.ops.int8_attention import quantize_kv

    nh = cfg.num_attention_heads
    return (
        tuple(quantize_kv(k, nh) for k in xk),
        tuple(quantize_kv(v, nh) for v in xv),
    )


def cached_generate(
    params: dict,
    cfg: BertConfig,
    condition_feat: jnp.ndarray,
    *,
    max_new_tokens: int = 40,
    mode: str = "greedy",           # 'greedy' | 'sample'
    top_k: int = 10,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    return_logp: bool = False,
    int8_cross_kv: bool = False,
):
    """KV-cached decode, output-identical to `generate(mode=greedy|sample)`
    at a fraction of the FLOPs (2 positions/step instead of the full
    buffer). With return_logp=True also returns per-step sampled-token logP
    (differentiable — the cached generate_scst)."""
    b = condition_feat.shape[0]
    h = cfg.hidden_size
    lmax = max_new_tokens + 1        # committed positions: [CLS] + tokens
    n_layers = cfg.num_hidden_layers
    if rng is None:
        rng = jax.random.PRNGKey(0)

    cond = condition_feat.astype(compute_dtype)
    xk, xv = _cross_kv(params, cond)
    xk = _unstack(xk.astype(compute_dtype), n_layers)
    xv = _unstack(xv.astype(compute_dtype), n_layers)
    split = CROSS_KV_SPLIT_HEADS and not int8_cross_kv
    xk = _maybe_split_heads(xk, cfg, split)
    xv = _maybe_split_heads(xv, cfg, split)
    xk, xv = _maybe_quantize_cross(xk, xv, cfg, int8_cross_kv)

    # lmax committed slots + the preallocated probe slot at index lmax
    ck0 = tuple(
        jnp.zeros((b, lmax + 1, h), compute_dtype) for _ in range(n_layers)
    )
    cv0 = tuple(
        jnp.zeros((b, lmax + 1, h), compute_dtype) for _ in range(n_layers)
    )
    tokens0 = jnp.full((b, lmax), BERT_PAD_ID, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(BERT_CLS_ID)

    emb = params["embeddings"]

    def step(carry, t):
        tokens, committed, ck, cv, finished, key = carry
        ids = jnp.stack([committed, jnp.full_like(committed, BERT_MASK_ID)], 1)
        pos = jnp.stack([jnp.full((b,), t), jnp.full((b,), t + 1)], 1)
        x = bert_embeddings(
            emb, cfg, ids, position_ids=pos, compute_dtype=compute_dtype
        )
        # additive bias (1, 1, 2, lmax+1): committed row sees cache ≤ t,
        # probe row sees cache ≤ t plus its own transient slot (index lmax)
        cols = jnp.arange(lmax + 1)
        row_c = jnp.where(cols <= t, 0.0, NEG_INF)
        row_p = jnp.where((cols <= t) | (cols == lmax), 0.0, NEG_INF)
        bias = jnp.stack([row_c, row_p])[None, None]

        x, ck, cv = _unrolled_layers(
            x, params, ck, cv, xk, xv, t, cfg, bias
        )
        logits = mlm_logits(params, cfg, x[:, 1:2])[:, 0].astype(jnp.float32)
        if mode == "greedy":
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        elif mode == "scst":
            # full-softmax multinomial, the SCST sampling rule
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, logits).astype(jnp.int32)
        else:
            key, sub = jax.random.split(key)
            vals, idx = jax.lax.top_k(logits, top_k)
            choice = jax.random.categorical(sub, vals)
            nxt = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
            nxt = nxt.astype(jnp.int32)
        logp_t = jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1), nxt[:, None], axis=1
        )[:, 0]
        logp_t = jnp.where(finished, 0.0, logp_t)
        nxt = jnp.where(finished, BERT_PAD_ID, nxt)
        tokens = tokens.at[:, t + 1].set(nxt)
        finished = finished | (nxt == BERT_SEP_ID)
        return (tokens, nxt, ck, cv, finished, key), logp_t

    init = (
        tokens0,
        jnp.full((b,), BERT_CLS_ID, jnp.int32),
        ck0, cv0,
        jnp.zeros((b,), bool),
        rng,
    )
    (tokens, _, _, _, _, _), logp = jax.lax.scan(
        step, init, jnp.arange(max_new_tokens)
    )
    if return_logp:
        return tokens, logp.T
    return tokens


def _prefill_prefix(params, cfg, prefix_ids, prefix_mask, cond,
                    total_len, compute_dtype, split_heads=False):
    """Encode the question prefix once (bidirectional over valid prefix
    positions, WITH cross-attention — identical to the prefix rows of the
    recompute part-causal decode) and capture each layer's self K/V.
    Returns per-layer TUPLES (see _unrolled_layers for why)."""
    b, lq = prefix_ids.shape
    h = cfg.hidden_size
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    n_layers = cfg.num_hidden_layers
    self_bias = extended_attention_mask(prefix_mask)
    x = bert_embeddings(
        params["embeddings"], cfg, prefix_ids, compute_dtype=compute_dtype
    )
    xk, xv = _cross_kv(params, cond)
    xk = _unstack(xk.astype(compute_dtype), n_layers)
    xv = _unstack(xv.astype(compute_dtype), n_layers)
    xk = _maybe_split_heads(xk, cfg, split_heads)
    xv = _maybe_split_heads(xv, cfg, split_heads)

    def body(x, lp, xkl, xvl):
        k = linear(x, lp["k_w"], lp["k_b"])
        v = linear(x, lp["v_w"], lp["v_b"])
        q = linear(x, lp["q_w"], lp["q_b"])
        qh = q.reshape(b, lq, nh, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, lq, nh, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, lq, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) * (hd**-0.5) + self_bias
        p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        o = o.transpose(0, 2, 1, 3).reshape(b, lq, h)
        x = layer_norm(
            x + linear(o, lp["attn_out_w"], lp["attn_out_b"]),
            lp["attn_ln_w"], lp["attn_ln_b"], cfg.layer_norm_eps,
        )
        xq = linear(x, lp["xq_w"], lp["xq_b"])
        o = _cross_mha(xq, xkl, xvl, cfg)
        x = layer_norm(
            x + linear(o, lp["x_out_w"], lp["x_out_b"]),
            lp["x_ln_w"], lp["x_ln_b"], cfg.layer_norm_eps,
        )
        y = gelu(linear(x, lp["inter_w"], lp["inter_b"]))
        x = layer_norm(
            x + linear(y, lp["out_w"], lp["out_b"]),
            lp["out_ln_w"], lp["out_ln_b"], cfg.layer_norm_eps,
        )
        pad = jnp.zeros((b, total_len - lq, h), k.dtype)
        return x, (
            jnp.concatenate([k, pad], axis=1),
            jnp.concatenate([v, pad], axis=1),
        )

    ck, cv = [], []
    for l in range(n_layers):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        x, (ckl, cvl) = body(x, lp, xk[l], xv[l])
        ck.append(ckl)
        cv.append(cvl)
    return tuple(ck), tuple(cv), xk, xv


def cached_generate_answers(
    params: dict,
    cfg: BertConfig,
    question_ids: jnp.ndarray,
    question_mask: jnp.ndarray,
    condition_feat: jnp.ndarray,
    *,
    max_new_tokens: int = 10,
    mode: str = "greedy",
    top_k: int = 10,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    int8_cross_kv: bool = False,
) -> jnp.ndarray:
    """KV-cached part-causal QA decode, output-identical to
    `generate_answers(mode=greedy|sample)`: the question prefix is encoded
    ONCE into the caches (the recompute loop re-encodes it every step)."""
    b, lq = question_ids.shape
    h = cfg.hidden_size
    lmax = max_new_tokens + 1
    total = lq + lmax
    if rng is None:
        rng = jax.random.PRNGKey(0)

    cond = condition_feat.astype(compute_dtype)
    # total committed slots + the preallocated probe slot at index `total`
    ck, cv, xk, xv = _prefill_prefix(
        params, cfg, question_ids, question_mask, cond, total + 1,
        compute_dtype,
        split_heads=CROSS_KV_SPLIT_HEADS and not int8_cross_kv,
    )
    xk, xv = _maybe_quantize_cross(xk, xv, cfg, int8_cross_kv)

    tokens0 = jnp.full((b, lmax), BERT_PAD_ID, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(BERT_CLS_ID)
    emb = params["embeddings"]
    # per-batch valid prefix columns for the additive bias
    prefix_cols = jnp.pad(
        question_mask.astype(jnp.float32), ((0, 0), (0, total + 1 - lq))
    )

    def step(carry, t):
        tokens, committed, ck, cv, finished, key = carry
        ids = jnp.stack([committed, jnp.full_like(committed, BERT_MASK_ID)], 1)
        pos = jnp.stack(
            [jnp.full((b,), lq + t), jnp.full((b,), lq + t + 1)], 1
        )
        x = bert_embeddings(
            emb, cfg, ids, position_ids=pos, compute_dtype=compute_dtype
        )
        cols = jnp.arange(total + 1)
        gen_c = (cols >= lq) & (cols <= lq + t)
        allow_c = jnp.maximum(prefix_cols, gen_c[None].astype(jnp.float32))
        allow_p = jnp.maximum(
            allow_c, (cols == total)[None].astype(jnp.float32)
        )
        bias = (1.0 - jnp.stack([allow_c, allow_p], axis=1)) * NEG_INF
        bias = bias[:, None]                       # (b, 1, 2, total+1)

        x, ck, cv = _unrolled_layers(
            x, params, ck, cv, xk, xv, lq + t, cfg, bias
        )
        logits = mlm_logits(params, cfg, x[:, 1:2])[:, 0].astype(jnp.float32)
        if mode == "greedy":
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            key, sub = jax.random.split(key)
            vals, idx = jax.lax.top_k(logits, top_k)
            choice = jax.random.categorical(sub, vals)
            nxt = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
            nxt = nxt.astype(jnp.int32)
        nxt = jnp.where(finished, BERT_PAD_ID, nxt)
        tokens = tokens.at[:, t + 1].set(nxt)
        finished = finished | (nxt == BERT_SEP_ID)
        return (tokens, nxt, ck, cv, finished, key), None

    init = (
        tokens0,
        jnp.full((b,), BERT_CLS_ID, jnp.int32),
        ck, cv,
        jnp.zeros((b,), bool),
        rng,
    )
    (tokens, _, _, _, _, _), _ = jax.lax.scan(
        step, init, jnp.arange(max_new_tokens)
    )
    return tokens


def cached_beam_generate(
    params: dict,
    cfg: BertConfig,
    condition_feat: jnp.ndarray,
    *,
    max_new_tokens: int = 40,
    num_beams: int = 3,
    length_penalty: float = 0.6,
    compute_dtype=jnp.float32,
    prefix_ids: Optional[jnp.ndarray] = None,
    prefix_mask: Optional[jnp.ndarray] = None,
    int8_cross_kv: bool = False,
) -> jnp.ndarray:
    """KV-cached beam search, output-identical to the recompute
    `_beam_generate`: beams live as (B·k) cache rows. With
    prefix_ids/prefix_mask (QA) the question prefix is prefilled once and
    replicated per beam.

    Beam reordering is ANCESTRY-MASKED, not physical: the self K/V caches
    are append-only per physical row (each live beam writes its new token's
    K/V into its own row), and a tiny (B, k, S) int32 ancestry table
    records which row holds each position of each beam's lineage.
    Self-attention runs as an in-group cross product (every query beam
    against every cache row of its sample, softmax over the flattened
    (row, position) axes) with the ancestry mask keeping exactly the
    lineage positions — mathematically identical to physically re-gathering
    the caches by parent index each step, but with zero cache movement.
    The physical re-gather (jnp.take over 24 caches inside the scan, which
    also broke XLA's in-place carry aliasing) ablated at 3.4 ms/step of the
    18.2 ms/step beam-3 deployment-shape decode; the in-group score/PV
    cross product costs k× the self-attention FLOPs, which are ~1000×
    smaller than the shared cross-attention reads."""
    b = condition_feat.shape[0]
    k = num_beams
    h = cfg.hidden_size
    v = cfg.vocab_size
    lq = 0 if prefix_ids is None else prefix_ids.shape[1]
    lmax = max_new_tokens + 1
    total = lq + lmax
    n_layers = cfg.num_hidden_layers
    bk = b * k

    cond = condition_feat.astype(compute_dtype)
    split = CROSS_KV_SPLIT_HEADS and not int8_cross_kv
    if prefix_ids is not None:
        # total committed slots + the preallocated probe slot
        ck0, cv0, xk, xv = _prefill_prefix(
            params, cfg, prefix_ids, prefix_mask, cond, total + 1,
            compute_dtype, split_heads=split,
        )
        # per-beam self caches
        ck0 = tuple(jnp.repeat(c, k, axis=0) for c in ck0)
        cv0 = tuple(jnp.repeat(c, k, axis=0) for c in cv0)
        pfx_cols = jnp.pad(
            prefix_mask.astype(jnp.float32), ((0, 0), (0, total + 1 - lq))
        )                                                 # (b, total+1)
    else:
        # cross K/V stay per batch element; beams fold into query rows
        xk, xv = _cross_kv(params, cond)
        xk = _unstack(xk.astype(compute_dtype), n_layers)
        xv = _unstack(xv.astype(compute_dtype), n_layers)
        xk = _maybe_split_heads(xk, cfg, split)
        xv = _maybe_split_heads(xv, cfg, split)
        ck0 = tuple(
            jnp.zeros((bk, total + 1, h), compute_dtype)
            for _ in range(n_layers)
        )
        cv0 = tuple(
            jnp.zeros((bk, total + 1, h), compute_dtype)
            for _ in range(n_layers)
        )
        pfx_cols = None
    xk, xv = _maybe_quantize_cross(xk, xv, cfg, int8_cross_kv)

    # ancestry[b, j, s] = the cache row (within the sample's k-group) that
    # holds beam j's position-s K/V; init self everywhere ([CLS] and any
    # replicated prefix live in each beam's own row)
    beam_iota = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[None, :, None], (b, k, total + 1)
    )
    ancestry0 = beam_iota

    tokens0 = jnp.full((b, k, lmax), BERT_PAD_ID, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(BERT_CLS_ID)
    live_scores0 = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)
    fin_tokens0 = tokens0
    fin_scores0 = jnp.full((b, k), NEG_INF)
    emb = params["embeddings"]

    def step(carry, t):
        (tokens, committed, live_scores, fin_tokens, fin_scores, anc,
         ck, cv) = carry
        flat_committed = committed.reshape(bk)
        ids = jnp.stack(
            [flat_committed, jnp.full_like(flat_committed, BERT_MASK_ID)], 1
        )
        pos = jnp.stack(
            [jnp.full((bk,), lq + t), jnp.full((bk,), lq + t + 1)], 1
        )
        x = bert_embeddings(
            emb, cfg, ids, position_ids=pos, compute_dtype=compute_dtype
        )
        cols = jnp.arange(total + 1)
        gen_c = ((cols >= lq) & (cols <= lq + t)).astype(jnp.float32)
        probe_c = (cols == total).astype(jnp.float32)
        if pfx_cols is None:
            allow_c = jnp.broadcast_to(gen_c[None, None], (b, k, total + 1))
            allow_p = jnp.broadcast_to(
                jnp.maximum(gen_c, probe_c)[None, None], (b, k, total + 1)
            )
        else:
            ac = jnp.maximum(pfx_cols, gen_c[None])          # (b, total+1)
            allow_c = jnp.broadcast_to(ac[:, None], (b, k, total + 1))
            allow_p = jnp.broadcast_to(
                jnp.maximum(ac, probe_c[None])[:, None], (b, k, total + 1)
            )
        # ancestry-masked in-group bias (b, kq, 2, kc, S): a column is
        # visible to query beam kq only in the cache row its lineage wrote
        anc_match = (
            anc[:, :, None, :]
            == jnp.arange(k, dtype=jnp.int32)[None, None, :, None]
        ).astype(jnp.float32)                            # (b, kq, kc, S)
        colx = jnp.stack([allow_c, allow_p], axis=2)     # (b, kq, 2, S)
        group_bias = (
            1.0 - colx[:, :, :, None, :] * anc_match[:, :, None, :, :]
        ) * NEG_INF                                      # (b, kq, 2, kc, S)

        x, ck, cv = _unrolled_layers(
            x, params, ck, cv, xk, xv, lq + t, cfg, None, n_rep=k,
            group_bias=group_bias,
        )
        logits = mlm_logits(params, cfg, x[:, 1:2])[:, 0].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)
        cand = live_scores[:, :, None] + logp

        flat = cand.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(flat, 2 * k)
        beam_idx = top_idx // v
        tok_idx = (top_idx % v).astype(jnp.int32)
        is_eos = tok_idx == BERT_SEP_ID

        gathered = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        new_tokens = gathered.at[:, :, t + 1].set(tok_idx)

        # HF BeamSearchScorer.process semantics (the stack the reference's
        # generate() call rides, model/bert.py:1126-1143 + transformers
        # beam_search): an EOS candidate is finalized only from the top
        # `num_beams` ranks of the 2k-candidate list; the hypothesis keeps
        # the EOS token; the length penalty runs over the FULL sequence
        # length including any question prefix ([CLS]+prefix+generated,
        # pre-4.38 full-length convention the reference ran with).
        rank_ok = jnp.arange(2 * k)[None, :] < k
        pen = jnp.power(jnp.float32(lq + t + 1), length_penalty)
        eos_scores = jnp.where(is_eos & rank_ok, top_scores / pen, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, eos_scores], axis=1)
        all_fin_tokens = jnp.concatenate([fin_tokens, new_tokens], axis=1)
        fin_scores, fin_keep = jax.lax.top_k(all_fin_scores, k)
        fin_tokens = jnp.take_along_axis(
            all_fin_tokens, fin_keep[:, :, None], axis=1
        )

        live_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        live_scores, live_keep = jax.lax.top_k(live_cand_scores, k)
        tokens = jnp.take_along_axis(
            new_tokens, live_keep[:, :, None], axis=1
        )
        committed = jnp.take_along_axis(tok_idx, live_keep, axis=1)

        # inherit the parent's ancestry row instead of physically
        # re-gathering the caches; next step's commit slot and the probe
        # slot are always self-owned
        parent = jnp.take_along_axis(beam_idx, live_keep, axis=1)  # (b, k)
        anc = jnp.take_along_axis(anc, parent[:, :, None], axis=1)
        anc = jax.lax.dynamic_update_slice(
            anc, beam_iota[:, :, :1], (0, 0, lq + t + 1)
        )
        anc = anc.at[:, :, total].set(beam_iota[:, :, 0])
        return (
            tokens, committed, live_scores, fin_tokens, fin_scores, anc,
            ck, cv,
        ), None

    init = (
        tokens0,
        jnp.full((b, k), BERT_CLS_ID, jnp.int32),
        live_scores0, fin_tokens0, fin_scores0, ancestry0, ck0, cv0,
    )
    (tokens, _, live_scores, fin_tokens, fin_scores, _, _, _), _ = (
        jax.lax.scan(step, init, jnp.arange(max_new_tokens))
    )

    pen = jnp.power(jnp.float32(lq + max_new_tokens + 1), length_penalty)
    final_live = live_scores / pen
    all_scores = jnp.concatenate([fin_scores, final_live], axis=1)
    all_tokens = jnp.concatenate([fin_tokens, tokens], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    out = jnp.take_along_axis(all_tokens, best[:, None, None], axis=1)[:, 0]
    return out


def generate_scst(
    params: dict,
    cfg: BertConfig,
    condition_feat: jnp.ndarray,
    *,
    max_new_tokens: int = 40,
    rng: jax.Array,
    compute_dtype=jnp.float32,
    use_cache: bool = False,
):
    """Self-critical (SCST) sampling: full-softmax multinomial decode that
    also returns the log-probability of each sampled token WITH gradients —
    the reference's grad-enabled `generate_scst`/`sample_scst`
    (model/bert.py:1505,1231; logP collection at model/bert.py:1452-1456).

    Returns (tokens (B, max_new_tokens+1) starting [CLS],
             logp   (B, max_new_tokens), zeroed after [SEP]).
    The policy-gradient REINFORCE loss is then
    `-(reward - baseline) * logp.sum(-1)` over e.g. CIDEr rewards; sampling
    is through `jax.random.categorical`, so only `logp` carries grad (the
    standard score-function estimator).

    use_cache=True routes through the KV-cached decoder (same tokens/logP,
    fewer forward FLOPs; the grad still saves per-step residuals, so prefer
    it when activation memory allows)."""
    if use_cache:
        return cached_generate(
            params, cfg, condition_feat, max_new_tokens=max_new_tokens,
            mode="scst", rng=rng, compute_dtype=compute_dtype,
            return_logp=True,
        )
    b = condition_feat.shape[0]
    l = max_new_tokens + 2
    tokens0 = jnp.full((b, l), BERT_PAD_ID, jnp.int32).at[:, 0].set(BERT_CLS_ID)
    finished0 = jnp.zeros((b,), bool)

    def step(carry, t):
        tokens, finished, key = carry
        probe = tokens.at[:, t + 1].set(BERT_MASK_ID)
        logits = _decode_logits(
            params, cfg, probe, t + 1, condition_feat, None, compute_dtype
        )
        key, sub = jax.random.split(key)
        nxt = jax.random.categorical(sub, logits).astype(jnp.int32)
        logp_t = jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1), nxt[:, None], axis=1
        )[:, 0]
        logp_t = jnp.where(finished, 0.0, logp_t)
        nxt = jnp.where(finished, BERT_PAD_ID, nxt)
        tokens = tokens.at[:, t + 1].set(nxt)
        finished = finished | (nxt == BERT_SEP_ID)
        return (tokens, finished, key), logp_t

    (tokens, _, _), logp = jax.lax.scan(
        step, (tokens0, finished0, rng), jnp.arange(max_new_tokens)
    )
    return tokens[:, : max_new_tokens + 1], logp.T


def _beam_generate(
    params, cfg, cond, max_new, k, length_penalty, compute_dtype,
    prefix_ids=None, prefix_mask=None,
):
    b = cond.shape[0]
    lq = 0 if prefix_ids is None else prefix_ids.shape[1]
    l = lq + max_new + 2
    v = cfg.vocab_size

    tokens0 = jnp.full((b, k, l), BERT_PAD_ID, jnp.int32)
    if prefix_ids is not None:
        tokens0 = tokens0.at[:, :, :lq].set(prefix_ids[:, None, :])
    tokens0 = tokens0.at[:, :, lq].set(BERT_CLS_ID)
    live_scores0 = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)
    fin_tokens0 = tokens0
    fin_scores0 = jnp.full((b, k), NEG_INF)

    cond_rep = jnp.repeat(cond, k, axis=0)            # (b*k, Lk, H)
    prefix_mask_rep = (
        None if prefix_mask is None else jnp.repeat(prefix_mask, k, axis=0)
    )

    def step(carry, t):
        tokens, live_scores, fin_tokens, fin_scores = carry
        probe = tokens.at[:, :, lq + t + 1].set(BERT_MASK_ID).reshape(b * k, l)
        logits = _decode_logits(
            params, cfg, probe, lq + t + 1, cond_rep, None, compute_dtype,
            prefix_mask=prefix_mask_rep,
        ).reshape(b, k, v)
        logp = jax.nn.log_softmax(logits, axis=-1)
        cand = live_scores[:, :, None] + logp          # (b, k, V)

        # top 2k candidates over beams×vocab — guarantees k non-EOS survivors
        flat = cand.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(flat, 2 * k)
        beam_idx = top_idx // v                        # (b, 2k)
        tok_idx = (top_idx % v).astype(jnp.int32)
        is_eos = tok_idx == BERT_SEP_ID

        gathered = jnp.take_along_axis(
            tokens, beam_idx[:, :, None], axis=1
        )                                              # (b, 2k, L)
        new_tokens = gathered.at[:, :, lq + t + 1].set(tok_idx)

        # finalize EOS candidates — HF BeamSearchScorer.process semantics:
        # only ranks < num_beams finalize, the hypothesis keeps its EOS, and
        # the penalty runs over the full length (prefix + [CLS] + generated,
        # pre-4.38 convention; see cached_beam_generate)
        rank_ok = jnp.arange(2 * k)[None, :] < k
        pen = jnp.power(jnp.float32(lq + t + 1), length_penalty)
        eos_scores = jnp.where(is_eos & rank_ok, top_scores / pen, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, eos_scores], axis=1)
        all_fin_tokens = jnp.concatenate([fin_tokens, new_tokens], axis=1)
        fin_scores, fin_keep = jax.lax.top_k(all_fin_scores, k)
        fin_tokens = jnp.take_along_axis(
            all_fin_tokens, fin_keep[:, :, None], axis=1
        )

        # live beams: best k non-EOS continuations
        live_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        live_scores, live_keep = jax.lax.top_k(live_cand_scores, k)
        tokens = jnp.take_along_axis(
            new_tokens, live_keep[:, :, None], axis=1
        )
        return (tokens, live_scores, fin_tokens, fin_scores), None

    (tokens, live_scores, fin_tokens, fin_scores), _ = jax.lax.scan(
        step,
        (tokens0, live_scores0, fin_tokens0, fin_scores0),
        jnp.arange(max_new),
    )

    # close out still-live beams at full length (HF finalize)
    pen = jnp.power(jnp.float32(lq + max_new + 1), length_penalty)
    final_live = live_scores / pen
    all_scores = jnp.concatenate([fin_scores, final_live], axis=1)
    all_tokens = jnp.concatenate([fin_tokens, tokens], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    out = jnp.take_along_axis(all_tokens, best[:, None, None], axis=1)[:, 0]
    return out[:, lq : lq + max_new + 1]
