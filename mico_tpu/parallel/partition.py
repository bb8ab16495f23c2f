"""Sharding rules: PartitionSpecs for the MiCo parameter pytree.

Data parallelism replicates parameters and shards the batch (the reference's
DDP, data/utils/build_model.py:56-57). Tensor parallelism (TPU headroom, no
reference equivalent) uses the Megatron layout on both towers:

  EVA ViT blocks  : qkv_w / fc1_w / w1_w / w2_w column-parallel (shard out),
                    proj_w / fc2_w / w3_w row-parallel (shard in)
  BERT layers     : q/k/v/xq/xk/xv + inter column-parallel,
                    attn_out/x_out/out row-parallel

Biases of column-parallel layers shard with the output dim; row-parallel
biases replicate. Everything else (embeddings, norms, heads) replicates —
they are tiny next to the towers. XLA/GSPMD inserts the all-reduces this
layout implies.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

# stacked block params: leading axis = layer. name → (spec for weight)
_COL = {"qkv_w", "fc1_w", "w1_w", "w2_w", "q_w", "k_w", "v_w", "xq_w", "xk_w",
        "xv_w", "inter_w"}
_COL_BIAS = {"q_bias", "v_bias", "fc1_b", "w1_b", "w2_b", "q_b", "k_b", "v_b",
             "xq_b", "xk_b", "xv_b", "inter_b", "ffn_ln_w", "ffn_ln_b"}
_ROW = {"proj_w", "fc2_w", "w3_w", "attn_out_w", "x_out_w", "out_w"}


def _spec_for(path: tuple, leaf, model_axis: Optional[str]) -> P:
    name = path[-1]
    if model_axis is None:
        return P()
    if name in _COL and leaf.ndim == 3:
        return P(None, None, model_axis)
    if name in _COL_BIAS and leaf.ndim == 2:
        return P(None, model_axis)
    if name in _ROW and leaf.ndim == 3:
        return P(None, model_axis, None)
    return P()


def mico_param_specs(params, model_axis: Optional[str] = "model"):
    """Pytree of PartitionSpecs matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(
            tuple(getattr(k, "key", getattr(k, "idx", None)) for k in path),
            leaf,
            model_axis,
        ),
        params,
    )


def batch_spec(data_axis: str = "data") -> P:
    """Shard the leading (batch) dim over the data axis."""
    return P(data_axis)


def zero1_split_spec(shape, base_spec: P, n_data: int,
                     data_axis: str = "data") -> P:
    """ZeRO-1 data split of a param-shaped leaf: `data` goes on the first
    dim the base (model-parallel) spec leaves free and the data axis
    divides — never on a model-sharded dim. Used for BOTH the Adam moments
    (their storage sharding) and the gradient sharding constraint inside
    the train step (so GSPMD reduce-scatters grads straight into the
    moment layout instead of all-reducing them replicated — all-reduce =
    reduce-scatter + all-gather, so the unconstrained lowering moves ~50%
    more collective bytes per step)."""
    axes = list(base_spec) + [None] * (len(shape) - len(base_spec))
    if n_data > 1:
        for i, d in enumerate(shape):
            if axes[i] is None and d >= n_data and d % n_data == 0:
                axes[i] = data_axis
                break
    while axes and axes[-1] is None:
        axes.pop()
    return P(*axes)
