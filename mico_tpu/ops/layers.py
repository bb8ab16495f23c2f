"""Elementary fused layers.

XLA fuses these into surrounding matmuls on TPU; we only need to get the
numerics right and keep reductions in fp32 for bf16 activations.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Perf experiment knob (scripts/perf_lab.py): when True, layer_norm output is
# materialized behind an optimization barrier instead of being fused as a
# producer into the consuming matmul.
BARRIER_AFTER_LN = False

# Perf experiment knob (scripts/perf_lab.py): dtype for LayerNorm statistics.
# fp32 is the deployed default (parity-gated); bf16 trades LN reduction
# precision for cheaper producer fusions into the consuming matmul.
LN_STATS_DTYPE = jnp.float32


# Perf/parity knob: True forces the exact erf GELU even for bf16 inputs.
GELU_EXACT_BF16 = False

# Perf diagnosis knob (scripts/train_bench.py --no-dropout): False makes
# dropout() the identity regardless of rng, isolating the cost of
# train-time random-mask generation in A/B timing runs. Never flip this in
# production training — it silently removes the reference regularizers.
DROPOUT_ENABLED = True


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU. fp32 inputs use the exact erf form — matches torch.nn.GELU and
    the reference's hand-written gelu (model/mico.py:22-28) bit-nearly for
    the golden-parity suite.

    bf16 inputs use the tanh approximation: its max abs error vs erf is
    4.7e-4, ~33x below bf16's own rounding error (1.6e-2) at the same
    magnitudes — indistinguishable at the deployed precision — while XLA's
    erf polynomial costs real MLP throughput on v5e (measured 125 vs
    160 TF/s on the chained ViT-g fc1+GELU+fc2 shape, scripts/mlp probes;
    the erf was the single largest per-op gap to the matmul roofline)."""
    approx = x.dtype == jnp.bfloat16 and not GELU_EXACT_BF16
    return jax.nn.gelu(x, approximate=approx)


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    eps: float,
) -> jnp.ndarray:
    """LayerNorm over the last axis with fp32 statistics.

    Matches torch.nn.LayerNorm (biased variance). Output is cast back to the
    input dtype so bf16 activation flows stay bf16. weight/bias may be None
    (affine-free: the inference-time fold moves γ/β into the consuming
    matmul — see models/eva_vit.fold_inference_params)."""
    orig_dtype = x.dtype
    xf = x.astype(LN_STATS_DTYPE)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(LN_STATS_DTYPE) + bias.astype(LN_STATS_DTYPE)
    y = y.astype(orig_dtype)
    if BARRIER_AFTER_LN:
        y = jax.lax.optimization_barrier(y)
    return y


def dropout(rng: Optional[jax.Array], rate: float, x: jnp.ndarray) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale by 1/keep at train time).
    Identity when rng is None (eval) or rate is 0."""
    if rng is None or rate <= 0.0 or not DROPOUT_ENABLED:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros_like(x))


def linear(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x @ W (+ b). W is stored (in_features, out_features) — JAX layout;
    the torch converter transposes. Accumulates in fp32 on the MXU; HIGHEST
    precision keeps fp32 parity runs exact at zero cost to bf16 runs."""
    y = jnp.dot(
        x,
        weight.astype(x.dtype),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
