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


# ---------------------------------------------------------------------------
# Host-side (multi-process) equivalents of the reference's pickled-object
# collectives (data/utils/distributed.py:70-128 all_gather_list /
# any_broadcast, and :133-149 ddp_allgather's pad-to-max variable gather).
# These run OUTSIDE jit, between steps — eval collection and loader sync.
# ---------------------------------------------------------------------------


def gather_objects(obj, max_bytes: int = 1 << 20) -> list:
    """All-gather an arbitrary picklable object across processes → list of
    every process's object (reference all_gather_list). Single-process:
    [obj]."""
    import pickle

    import numpy as np

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    blob = pickle.dumps(obj)
    if len(blob) + 8 > max_bytes:
        raise ValueError(f"object too large ({len(blob)}B > {max_bytes}B)")
    buf = np.zeros((max_bytes,), np.uint8)
    buf[:8] = np.frombuffer(
        np.int64(len(blob)).tobytes(), np.uint8
    )   # length prefix, like the reference's byte codec (_encode/_decode)
    buf[8 : 8 + len(blob)] = np.frombuffer(blob, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for row in gathered:
        n = int(np.frombuffer(row[:8].tobytes(), np.int64)[0])
        out.append(pickle.loads(row[8 : 8 + n].tobytes()))
    return out


def broadcast_object(obj, max_bytes: int = 1 << 20):
    """Broadcast process 0's picklable object to every process (reference
    any_broadcast — used to sync the MetaLoader task choice). Our MetaLoader
    already agrees cross-host via a shared seed; this exists for arbitrary
    host decisions."""
    if jax.process_count() == 1:
        return obj
    objs = gather_objects(obj, max_bytes)
    return objs[0]


def gather_variable_batch(x, axis_name: Optional[str], max_batch: int):
    """In-jit gather of per-shard VARIABLE batch sizes by pad-to-max + mask
    (reference ddp_allgather pads to the max length then trims; under XLA
    shapes are static, so callers pass the static bound and get a validity
    mask back). x: (b, ...) with b ≤ max_batch. → (world*max_batch, ...),
    (world*max_batch,) bool mask."""
    b = x.shape[0]
    pad = [(0, max_batch - b)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad)
    valid = (jnp.arange(max_batch) < b)
    if axis_name is None:
        return xp, valid
    g = jax.lax.all_gather(xp, axis_name).reshape((-1,) + xp.shape[1:])
    v = jax.lax.all_gather(valid, axis_name).reshape(-1)
    return g, v
