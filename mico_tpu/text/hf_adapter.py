"""HuggingFace text-encoder adapter + pooler registry.

Capability parity with the reference HF adapter
(model/evaclip/hf_model.py:1-248: `_POOLERS` registry with mean/max/cls
pooling over masked token features, optional linear/MLP projection to the
CLIP embed dim; model/evaclip/tokenizer.py:189-201 `HFTokenizer`).

TPU-native split: tokenization stays a host-side `transformers` call; the
pooling/projection math is pure jnp so it composes into any jitted program.
Converting an arbitrary HF torch text tower into jnp parameters is the job
of per-family converters (our BERT converter covers the family MiCo uses) —
this module supplies the shared pooling/projection surface and the
tokenizer bridge.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Union

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Pooler registry (hf_model.py:35-77)
# ---------------------------------------------------------------------------

POOLERS: Dict[str, Callable] = {}


def register_pooler(name: str):
    def deco(fn):
        POOLERS[name] = fn
        return fn
    return deco


@register_pooler("mean_pooler")
def mean_pooler(hidden: jnp.ndarray, attention_mask: jnp.ndarray):
    """Masked mean over tokens (hf_model.py:44-49)."""
    m = attention_mask[..., None].astype(hidden.dtype)
    return (hidden * m).sum(axis=1) / m.sum(axis=1)


@register_pooler("max_pooler")
def max_pooler(hidden: jnp.ndarray, attention_mask: jnp.ndarray):
    """Masked max over tokens (hf_model.py:51-56)."""
    neg = jnp.finfo(hidden.dtype).min
    m = attention_mask[..., None].astype(bool)
    return jnp.where(m, hidden, neg).max(axis=1)


@register_pooler("cls_pooler")
def cls_pooler(hidden: jnp.ndarray, attention_mask: jnp.ndarray = None):
    """First-token pooling (hf_model.py:58-66)."""
    return hidden[:, 0]


def pool_and_project(
    hidden: jnp.ndarray,
    attention_mask: jnp.ndarray,
    pooler: str = "cls_pooler",
    proj_kernel: jnp.ndarray = None,
) -> jnp.ndarray:
    """pooler from POOLERS; optional bias-free linear projection
    (hf_model.py:118-133)."""
    x = POOLERS[pooler](hidden, attention_mask)
    if proj_kernel is not None:
        x = x @ proj_kernel.astype(x.dtype)
    return x


# ---------------------------------------------------------------------------
# Tokenizer bridge (tokenizer.py:189-201)
# ---------------------------------------------------------------------------


class HFTokenizer:
    """Wraps `transformers.AutoTokenizer` with the CLIP fixed-length
    contract: whitespace-cleaned input, max_length padding + truncation,
    numpy int32 ids out."""

    def __init__(self, tokenizer_name: str):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name)

    def __call__(
        self, texts: Union[str, List[str]], context_length: int = 77
    ):
        import numpy as np

        if isinstance(texts, str):
            texts = [texts]
        texts = [" ".join(t.split()) for t in texts]
        enc = self.tokenizer(
            texts,
            max_length=context_length,
            padding="max_length",
            truncation=True,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)


# per-HF-model-type default pooler (reference hf_configs.py arch_dict)
ARCH_POOLERS: Dict[str, str] = {
    "roberta": "mean_pooler",
    "xlm-roberta": "mean_pooler",
    "mt5": "mean_pooler",
    "bert": "cls_pooler",
}


def default_pooler_for(model_type: str) -> str:
    return ARCH_POOLERS.get(model_type, "cls_pooler")
