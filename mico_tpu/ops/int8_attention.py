"""Dequant-fused int8 cross-attention for KV-cached decode.

The beam/sample decode step is HBM-bound on the per-layer cross-attention
K/V reads (deployment shape 64×2056×768 bf16 ≈ 400 MB per layer per step,
~5.9 ms/step across 12 layers at HBM roofline — BASELINE §Captioner). The
fix the round-2 review asked for: store the condition K/V as int8 with
per-(row, head) scales — halving the dominant HBM stream — and dequantize
INSIDE a Pallas kernel so the dense bf16 tensors never exist in HBM.

Why a kernel is required: the plain-XLA int8 route is a measured dead end —
XLA rematerializes the dequantized array every scan step instead of fusing
it into the attention matmuls (2.6× SLOWER, recorded in BASELINE). Here the
int8 tiles stream HBM→VMEM, and the dequant multiply runs on the VPU
between the two MXU passes.

Shape regime: decode queries are tiny (2 rows per sequence, ×beams), and
the whole int8 K/V for one batch element (~3.2 MB at the deployment shape)
fits VMEM resident — so the grid is (batch,) with full-row softmax, no
online-softmax recurrence.

Quantization: symmetric per-(row, head) int8, scale = max|x|/127 (fp32).
Worst-case relative error ~0.4% of the row-head max, below the decode
tolerance gate (≥0.99 token agreement, golden CIDEr unchanged — tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_kv(x: jnp.ndarray, num_heads: int):
    """(B, Lk, H) float → ((B, Lk, H) int8, (B, Lk, nh) fp32 scales).

    Symmetric per-(row, head) quantization; dequant is x8 * scale."""
    b, lk, h = x.shape
    d = h // num_heads
    xf = x.astype(jnp.float32).reshape(b, lk, num_heads, d)
    amax = jnp.max(jnp.abs(xf), axis=-1)                     # (B, Lk, nh)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(xf / scale[..., None])
    q = jnp.clip(q, -127, 127).astype(jnp.int8).reshape(b, lk, h)
    return q, scale


# Batch elements per grid step. The per-grid-step fixed cost (~15 µs
# measured on v5e) dwarfs the int8 HBM read it buys at G=1; grouping
# amortizes it while the int8 blocks stay far under VMEM.
_GROUP = 8


def _int8_cross_kernel(q_ref, k8_ref, ks_ref, v8_ref, vs_ref, o_ref,
                       *, nh, d, scale, group):
    for gi in range(group):
        q = q_ref[gi]                                        # (Lq, H) bf16
        for h in range(nh):
            qh = q[:, h * d : (h + 1) * d]
            kh8 = k8_ref[gi][:, h * d : (h + 1) * d]         # (Lk, d) int8
            ksh = ks_ref[gi][:, h : h + 1]                   # (Lk, 1) f32
            # dequant on the VPU; bf16 for the MXU pass
            kh = (kh8.astype(jnp.float32) * ksh).astype(q.dtype)
            s = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * jnp.float32(scale)                           # (Lq, Lk)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            vh8 = v8_ref[gi][:, h * d : (h + 1) * d]
            vsh = vs_ref[gi][:, h : h + 1]
            vh = (vh8.astype(jnp.float32) * vsh).astype(q.dtype)
            o = jnp.dot(
                p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
            )
            o_ref[gi, :, h * d : (h + 1) * d] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret")
)
def _int8_cross_call(q, k8, ks, v8, vs, num_heads, scale, interpret):
    b, lq, h = q.shape
    lk = k8.shape[1]
    d = h // num_heads
    group = _GROUP
    while b % group:
        group //= 2
    kernel = functools.partial(
        _int8_cross_kernel, nh=num_heads, d=d, scale=scale, group=group
    )
    row = lambda bi: (bi, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, lq, h), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, lk, h), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, lk, num_heads), row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, lk, h), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, lk, num_heads), row,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, lq, h), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * lq * lk * h,
            # the point of the kernel: HBM traffic = int8 K/V + scales
            bytes_accessed=k8.size * 2 + ks.size * 4 * 2 + q.size * 2 * 2,
            transcendentals=b * num_heads * lq * lk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, k8, ks, v8, vs)


def _int8_cross_reference(q, k8, ks, v8, vs, num_heads, scale):
    """XLA reference with identical math (dequant → bf16 MHA). Used off-TPU
    and as the numerics oracle for the kernel tests."""
    b, lq, h = q.shape
    lk = k8.shape[1]
    d = h // num_heads
    dq = lambda x8, s: (
        x8.astype(jnp.float32).reshape(b, lk, num_heads, d) * s[..., None]
    ).astype(q.dtype)
    kh = dq(k8, ks).transpose(0, 2, 1, 3)                    # (B, nh, Lk, d)
    vh = dq(v8, vs).transpose(0, 2, 1, 3)
    qh = q.reshape(b, lq, num_heads, d).transpose(0, 2, 1, 3)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p, vh, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return o.transpose(0, 2, 1, 3).reshape(b, lq, h)


# test/dryrun knob mirroring flash_attention.FORCE_KERNEL_INTERPRET
FORCE_KERNEL_INTERPRET = False


def int8_cross_attention(
    q: jnp.ndarray,
    k8: jnp.ndarray,
    ks: jnp.ndarray,
    v8: jnp.ndarray,
    vs: jnp.ndarray,
    num_heads: int,
    scale: float | None = None,
) -> jnp.ndarray:
    """q (B, Lq, H) bf16/f32; k8/v8 (B, Lk, H) int8; ks/vs (B, Lk, nh) f32.
    Returns (B, Lq, H) in q's dtype. Decode-only (no backward)."""
    if scale is None:
        scale = float(q.shape[-1] // num_heads) ** -0.5
    if jax.default_backend() != "tpu":
        if FORCE_KERNEL_INTERPRET:
            return _int8_cross_call(q, k8, ks, v8, vs, num_heads,
                                    float(scale), True)
        return _int8_cross_reference(q, k8, ks, v8, vs, num_heads, scale)
    return _int8_cross_call(q, k8, ks, v8, vs, num_heads, float(scale), False)
