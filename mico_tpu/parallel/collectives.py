"""Collective helpers for loss code running under shard_map/pjit.

TPU-native equivalents of the reference's NCCL wrappers
(data/utils/distributed.py):
  - concat_all_gather (no grad)      → all_gather_no_grad
  - GatherLayer/all_gather_with_grad → all_gather_concat (JAX differentiates
    lax.all_gather natively: the backward is the gradient-correct
    reduce-scatter the reference implements by hand)
  - dist.get_rank()                  → data_axis_index

All helpers accept axis_name=None for single-device execution (the functions
degrade to identities), so the same loss code runs in unit tests, one-chip
inference and multi-chip pjit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def all_gather_concat(x: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    """Gather along the batch axis with gradients flowing back to every
    shard's contribution."""
    if axis_name is None:
        return x
    g = jax.lax.all_gather(x, axis_name)          # (world, b, ...)
    return g.reshape((-1,) + x.shape[1:])


def all_gather_no_grad(x: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    return jax.lax.stop_gradient(all_gather_concat(x, axis_name))


def data_axis_index(axis_name: Optional[str]) -> jnp.ndarray:
    if axis_name is None:
        return jnp.int32(0)
    return jax.lax.axis_index(axis_name)


def data_axis_size(axis_name: Optional[str]):
    if axis_name is None:
        return 1
    return jax.lax.psum(1, axis_name)
