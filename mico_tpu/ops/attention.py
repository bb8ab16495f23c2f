"""Multi-head attention entry point.

Two interchangeable implementations:
  - `xla`:   plain jnp einsum/softmax; XLA fuses well, differentiable, runs on
             any backend. fp32 softmax/accumulation regardless of input dtype.
  - `flash`: Pallas TPU kernel (mico_tpu/ops/flash_attention.py), online
             softmax, O(L) memory; used on the inference hot path.

Replaces the reference's xformers `memory_efficient_attention` call sites
(model/evaclip/eva_vit_model.py:325-338) and the naive torch attention path
(model/evaclip/eva_vit_model.py:339-361, model/bert.py:152-283).

Shapes: q (B, H, Lq, D); k, v (B, H, Lk, D); additive bias broadcastable to
(B, H, Lq, Lk) — pass (B, 1, 1, Lk) for padding masks or (B, 1, Lq, Lk) for
3D masks, values 0 / -10000-style.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# 'auto' routes to XLA when lq·lk is at or below this (tiny self-attention
# like the ≤64-token text branch; see multi_head_attention)
SMALL_ATTN_XLA_MAX = 64 * 64


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """dropout_rng/dropout_rate: training-time attention-probs dropout
    (reference BertSelfAttention, model/bert.py:169,291 — probs are dropped
    AFTER the softmax, torch semantics)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q,
        k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = scores * jnp.float32(scale)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rng is not None and dropout_rate > 0.0:
        from mico_tpu.ops.layers import dropout

        probs = dropout(dropout_rng, dropout_rate, probs)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(v.dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """impl: 'auto' | 'xla' | 'flash'. 'auto' picks flash on TPU. With
    attention-probs dropout active (training), the XLA path is used — the
    flash kernel never materializes probabilities to drop."""
    if dropout_rng is not None and dropout_rate > 0.0:
        return xla_attention(
            q, k, v, bias=bias, scale=scale,
            dropout_rng=dropout_rng, dropout_rate=dropout_rate,
        )
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    # 'flash' is a performance hint, not semantics: tiny self-attention
    # (both seq dims small, e.g. the 30-token text branch) fuses into a
    # handful of XLA ops, while the flash kernel pays (B·H) near-empty grid
    # steps — measured 1.88 vs 2.28 ms for the 12-layer BERT pass at
    # (16, 30) on v5e. Cross-attention over long contexts (lk ≫ lq) stays
    # on the kernel.
    if impl == "flash" and q.shape[2] * k.shape[2] <= SMALL_ATTN_XLA_MAX:
        impl = "xla"
    if impl == "flash":
        from mico_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias, scale=scale)
    return xla_attention(q, k, v, bias=bias, scale=scale)
