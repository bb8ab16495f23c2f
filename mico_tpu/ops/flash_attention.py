"""Pallas TPU attention kernel.

Block-Q / resident-KV design: MiCo's sequences are short (257 tokens per
frame for the ViT; ≤ ~1300 tokens of fused multimodal context for BERT
cross-attention), so for each (batch, head) the full K/V comfortably fits in
VMEM. The kernel tiles only the query axis; scores for a query tile are
computed in one MXU pass, softmaxed in fp32 in VMEM, and contracted with the
resident V — no HBM materialization of the (Lq, Lk) probability matrix, which
is what makes the XLA fallback memory-bound.

For contexts beyond MAX_RESIDENT_KV we fall back to the XLA implementation
(correct, just not as fast); an online-softmax KV-tiled variant can replace
that fallback when long-context support lands.

Replaces xformers `memory_efficient_attention`
(reference: model/evaclip/eva_vit_model.py:325-338).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Beyond this many KV rows (fp32 score tile TQ x Lk plus resident K/V) we
# spill VMEM; fall back to XLA.
MAX_RESIDENT_KV = 8192
DEFAULT_TQ = 128


def _prec_for(dtype) -> jax.lax.Precision:
    """HIGHEST keeps fp32 inputs exact (parity runs). For bf16 inputs use
    DEFAULT: the MXU's native bf16×bf16→fp32 pass — Mosaic rejects a
    contract_precision<fp32> (HIGHEST) matmul with bf16 operands
    ("Bad lhs type")."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32) * scale          # (TQ, D)
    k = k_ref[0, 0]                                      # (Lk, D)
    prec = _prec_for(k.dtype)
    s = jax.lax.dot_general(
        q.astype(k.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )                                                    # (TQ, Lk)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0]                                      # (Lk, D)
    o = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=prec
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def _kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32) * scale
    k = k_ref[0, 0]
    prec = _prec_for(k.dtype)
    s = jax.lax.dot_general(
        q.astype(k.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    s = s + b_ref[0, 0].astype(jnp.float32)              # (TQ|1, Lk) broadcast
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0]
    o = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=prec
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def _flash(q, k, v, bias, scale, block_q, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    tq = min(block_q, lq)
    grid = (b, h, pl.cdiv(lq, tq))

    in_specs = [
        pl.BlockSpec((1, 1, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        bb, bh, blq, _ = bias.shape
        tb = tq if blq != 1 else 1

        def bias_index(bi, hi, qi, bb=bb, bh=bh, blq=blq):
            return (bi if bb != 1 else 0,
                    hi if bh != 1 else 0,
                    qi if blq != 1 else 0,
                    0)

        in_specs.append(
            pl.BlockSpec((1, 1, tb, lk), bias_index, memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kernel = functools.partial(_kernel_bias, scale=scale)
    else:
        kernel = functools.partial(_kernel, scale=scale)

    flops = 2 * 2 * b * h * lq * lk * d
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=q.size * 2 + k.size * 4, transcendentals=b * h * lq * lk
        ),
        interpret=interpret,
    )(*args)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_TQ,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """q (B,H,Lq,D); k,v (B,H,Lk,D); bias broadcastable (B|1,H|1,Lq|1,Lk)."""
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    if k.shape[2] > MAX_RESIDENT_KV:
        from mico_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v, bias=bias, scale=scale)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash(q, k, v, bias, float(scale), block_q, interpret)
