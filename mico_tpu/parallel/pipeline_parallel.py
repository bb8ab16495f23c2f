"""GPipe-style pipeline parallelism over a mesh axis.

The reference has no pipeline parallelism (SURVEY §2.3: DP only); this is
TPU headroom for models whose layer stack outgrows one chip. The design is
the canonical JAX pipeline: layers are sharded over the `stage` mesh axis,
microbatches march through the stages with `ppermute` hops, and the whole
schedule is a `lax.scan` over (n_micro + n_stages - 1) ticks — so it jits
once, and (because `ppermute` is differentiable, its transpose being the
reverse hop) the same code trains: JAX autodiff derives the backward
pipeline schedule automatically.

Use via `pipeline_apply` inside a shard_map over the stage axis, or the
convenience `pipelined` wrapper that builds the shard_map for a mesh.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P


def pipeline_apply(
    layer_fn: Callable,
    stage_params,
    x_micro: jnp.ndarray,
    axis: str,
    n_stages: int,
):
    """Run inside shard_map(axis): march microbatches through the stages.

    layer_fn(stage_params, x) -> x : applies THIS stage's layer slice
                                     (stage_params leaves lead with the
                                     per-stage layer axis).
    x_micro: (n_micro, mb, ...) — full microbatch tape, identical on every
             stage (stage 0 consumes it; other stages ignore it).
    → (n_micro, mb, ...) outputs as produced by the LAST stage (identical
      on every stage after the final collective).
    """
    n_micro = x_micro.shape[0]
    stage = jax.lax.axis_index(axis)
    n_ticks = n_micro + n_stages - 1
    buf0 = jnp.zeros_like(x_micro[0])
    out0 = jnp.zeros_like(x_micro)

    def tick(carry, t):
        buf, out = carry
        # stage 0 injects microbatch t (while any remain)
        inject = jnp.where(
            (stage == 0) & (t < n_micro),
            x_micro[jnp.minimum(t, n_micro - 1)],
            buf,
        )
        y = layer_fn(stage_params, inject)
        # the last stage finished microbatch t-(S-1): record it
        done_idx = t - (n_stages - 1)
        record = (stage == n_stages - 1) & (done_idx >= 0)
        out = jax.lax.dynamic_update_slice(
            out,
            jnp.where(record, y, out[jnp.maximum(done_idx, 0)])[None],
            (jnp.maximum(done_idx, 0),) + (0,) * (out.ndim - 1),
        )
        # hop activations to the next stage
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        buf = jax.lax.ppermute(y, axis, perm)
        return (buf, out), None

    (_, out), _ = jax.lax.scan(tick, (buf0, out0), jnp.arange(n_ticks))
    # broadcast the last stage's tape to every stage (zero elsewhere + psum)
    # so downstream unsharded code sees one coherent result
    mine = jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out))
    return jax.lax.psum(mine, axis)


def _auto_n_micro(batch: int, n_stages: int) -> int:
    """Largest divisor of `batch` that is <= 2*n_stages.

    2*S bounds the fill-drain bubble (S-1)/(S+M-1) under ~1/3; clamping to a
    divisor of the per-shard batch guarantees no zero-size microbatches
    whatever the batch (the round-4 default crashed at batch < 2*S)."""
    cap = min(2 * n_stages, batch)
    for m in range(cap, 0, -1):
        if batch % m == 0:
            return m
    return 1


def pipelined(
    layer_fn: Callable,
    mesh: Mesh = None,
    axis: str = "model",
    n_micro: int = None,
    data_axis: str = None,
):
    """Build f(stacked_layer_params, x) running `layer_fn` as an `axis`-way
    pipeline over microbatches of the leading batch dim.

    stacked_layer_params: leaves lead with the TOTAL layer count (divisible
    by the stage count); x: (batch, ...).  n_micro=None picks the largest
    divisor of the per-shard batch <= 2*stages (bubble <= ~1/3, never a
    zero-size microbatch); an explicit n_micro must divide the per-shard
    batch or a ValueError is raised at trace time.
    Differentiable end to end.

    mesh=None uses the ambient mesh (`jax.sharding.set_mesh`) — how the
    runtime integration calls it from inside the jitted train step.
    data_axis: keep the batch dim sharded over this mesh axis (DP x PP);
    None replicates the batch across the pipeline group."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    n_stages = mesh.shape[axis]
    x_spec = P(data_axis) if data_axis else P()

    def split_layers(p):
        return jax.tree.map(
            lambda l: l.reshape(
                (n_stages, l.shape[0] // n_stages) + l.shape[1:]
            ),
            p,
        )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    def run(stage_params, x):
        stage_params = jax.tree.map(lambda l: l[0], stage_params)
        batch = x.shape[0]
        if n_micro is None:
            nm = _auto_n_micro(batch, n_stages)
        else:
            nm = n_micro
            if nm > batch or batch % nm:
                raise ValueError(
                    f"pipeline_microbatches={nm} must divide the per-shard "
                    f"batch {batch} (and be <= it); use "
                    f"pipeline_microbatches=None to auto-pick the largest "
                    f"divisor <= 2*stages"
                )
        micro = x.reshape((nm, batch // nm) + x.shape[1:])
        out = pipeline_apply(
            layer_fn, stage_params, micro, axis, n_stages
        )
        return out.reshape(x.shape)

    def f(stacked_params, x):
        return run(split_layers(stacked_params), x)

    return f
