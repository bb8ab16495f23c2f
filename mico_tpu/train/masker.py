"""BERT-style token masking, device-native.

Re-design of the reference `TokenMasker`
(data/model/general_module.py:52-97): mask each non-pad, non-position-0
token with prob p; 80% → [MASK], 10% → random token in [range_start,
range_end), 10% → keep; labels are the original ids at masked positions and
-100 elsewhere.

The reference retries whole rows until ≥1 position is masked — a
data-dependent loop. The TPU version instead force-masks the valid position
with the smallest draw when a row would otherwise be empty (identical
marginal behavior for any realistic p·len, and shape-static)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mico_tpu.config import BERT_MASK_ID


def mask_tokens(
    rng: jax.Array,
    tokens: jnp.ndarray,            # (b, L) int32
    mask_prob: float,
    mask_token: int = BERT_MASK_ID,
    range_start: int = 106,
    range_end: int = 30522,
    pad_id: int = 0,
):
    """→ (masked_tokens, labels)."""
    b, l = tokens.shape
    k_sel, k_kind, k_rand = jax.random.split(rng, 3)

    valid = (tokens != pad_id) & (
        jnp.arange(l)[None, :] > 0
    )  # never mask position 0 (reference loops j from 1)

    u = jax.random.uniform(k_sel, (b, l))
    mask = valid & (u < mask_prob)

    # force ≥1 masked position per row that has any valid token
    has_any = jnp.any(mask, axis=1)
    u_valid = jnp.where(valid, u, jnp.inf)
    force = jax.nn.one_hot(jnp.argmin(u_valid, axis=1), l, dtype=bool)
    row_has_valid = jnp.any(valid, axis=1)
    mask = jnp.where(
        (~has_any & row_has_valid)[:, None], force & valid, mask
    )

    kind = jax.random.uniform(k_kind, (b, l))
    rand_tok = jax.random.randint(
        k_rand, (b, l), range_start, range_end, dtype=tokens.dtype
    )
    replaced = jnp.where(
        kind < 0.8,
        jnp.full_like(tokens, mask_token),
        jnp.where(kind < 0.9, rand_tok, tokens),
    )
    out = jnp.where(mask, replaced, tokens)
    labels = jnp.where(mask, tokens, -100)
    return out, labels
