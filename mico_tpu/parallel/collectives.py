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


def process_allgather(x_local) -> "np.ndarray":
    """All-gather one identically-shaped numpy array per process →
    (process_count, *shape) on every process.

    jax.experimental.multihost_utils was removed in jax 0.9; this is the
    same collective on public APIs: a 1-device-per-process mesh (the
    lowest-id device of each process, globally ordered), each process
    contributing its row via make_array_from_single_device_arrays, and a
    replicated-output jit to run the actual gather."""
    import numpy as np

    x_local = np.asarray(x_local)
    n = jax.process_count()
    if n == 1:
        return x_local[None]
    per_proc = {}
    for d in jax.devices():
        if d.process_index not in per_proc or d.id < per_proc[d.process_index].id:
            per_proc[d.process_index] = d
    devs = np.array([per_proc[i] for i in range(n)])
    mesh = jax.sharding.Mesh(devs, ("proc",))
    row_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("proc")
    )
    mine = per_proc[jax.process_index()]
    garr = jax.make_array_from_single_device_arrays(
        (n,) + x_local.shape,
        row_sh,
        [jax.device_put(x_local[None], mine)],
    )
    out = jax.jit(
        lambda a: a,
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        ),
    )(garr)
    return np.asarray(out.addressable_data(0))


def gather_objects(obj) -> list:
    """All-gather an arbitrary picklable object across processes → list of
    every process's object (reference all_gather_list). Single-process:
    [obj].

    Two-phase, like the reference's length-prefix byte codec
    (distributed.py:70-92): gather each blob's length first, then gather
    the payloads padded to the actual max — so eval-sized objects
    (feature matrices, tens of MB) cost exactly one max-size buffer, not a
    guessed static cap."""
    import pickle

    import numpy as np

    if jax.process_count() == 1:
        return [obj]

    blob = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = np.asarray(process_allgather(np.int64(len(blob)))).reshape(-1)
    buf = np.zeros((int(lens.max()),), np.uint8)
    buf[: len(blob)] = blob
    gathered = process_allgather(buf)
    return [
        pickle.loads(np.asarray(row)[: int(n)].tobytes())
        for row, n in zip(gathered, lens)
    ]


def broadcast_object(obj):
    """Broadcast process 0's picklable object to every process (reference
    any_broadcast — used to sync the MetaLoader task choice). Our MetaLoader
    already agrees cross-host via a shared seed; this exists for arbitrary
    host decisions."""
    if jax.process_count() == 1:
        return obj
    return gather_objects(obj)[0]


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
