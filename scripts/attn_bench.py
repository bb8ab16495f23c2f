"""Long-context attention bench: KV-tiled Pallas kernel vs XLA fallback.

The reference's cross-attention context grows as n_frames x 257
(model/mico.py:187-248): a 32-frame video is 8,224 tokens — past the
resident-KV kernel's cliff (MAX_RESIDENT_KV=8192). Round 1 fell back to XLA
there; the KV-tiled online-softmax kernel (ops/flash_attention.py) now keeps
those shapes on the MXU. This measures both at the shapes that matter, with
host-readback timing.

Usage: python scripts/attn_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.ops.attention import xla_attention
from mico_tpu.ops.flash_attention import _flash_kv_tiled, KV_TILED_TQ, KV_TILED_TK

SHAPES = [
    # (label, b, h, lq, lk, d) — the Lq sweep at Lk=8224 is what sets
    # ops/flash_attention.KV_TILED_MIN_Q (crossover ≈ 128 on v5e)
    ("32-frame BERT cross-attn (train, caption q-rows)", 64, 12, 40, 8224, 64),
    ("Lk=8224 crossover point", 64, 12, 128, 8224, 64),
    ("Lk=8224 large-q", 64, 12, 512, 8224, 64),
    ("16k generic long context", 8, 16, 1024, 16384, 88),
]


def bench(fn, args, iters=5):
    out = fn(*args)
    np.asarray(out[0, 0, 0, :4])  # compile + hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args)[0, 0, 0, :4])
    return (time.perf_counter() - t0) / iters


BWD_SHAPES = [
    # long-context TRAINING story (round-2 VERDICT missing #4): fwd+bwd
    # through the custom_vjp at past-resident-KV shapes
    ("16k fwd+bwd", 2, 16, 1024, 16384, 88),
    ("Lk=8224 fwd+bwd large-q", 8, 12, 512, 8224, 64),
]


def bench_bwd():
    """A/B: Pallas KV-tiled backward vs the XLA-recompute backward, through
    jax.grad on the public flash_attention entry."""
    from mico_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(0)
    for label, b, h, lq, lk, d in BWD_SHAPES:
        q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.bfloat16)
        scale = float(d) ** -0.5

        def loss(q, k, v):
            o = fa.flash_attention(q, k, v, scale=scale)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        grad_pallas = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        def loss_xla(q, k, v):
            o = xla_attention(q, k, v, scale=scale)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        grad_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))

        def run(fn):
            out = fn(q, k, v)
            np.asarray(out[0][0, 0, 0, :4])
            t0 = time.perf_counter()
            for _ in range(5):
                np.asarray(fn(q, k, v)[0][0, 0, 0, :4])
            return (time.perf_counter() - t0) / 5

        dt_p = run(grad_pallas)
        dt_x = run(grad_xla)
        fl = 4 * 2 * 2 * b * h * lq * lk * d   # fwd(2) + bwd(~5+recompute)/…
        print(f"{label}:")
        print(f"  pallas fwd+bwd: {dt_p*1e3:8.2f} ms")
        print(f"  xla-recompute:  {dt_x*1e3:8.2f} ms  (pallas {dt_x/dt_p:.2f}x)")


def main():
    if "--bwd" in sys.argv:
        bench_bwd()
        return
    rng = np.random.default_rng(0)
    for label, b, h, lq, lk, d in SHAPES:
        q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.bfloat16)
        scale = float(d) ** -0.5

        # the production tile floors (what flash_attention dispatch uses)
        kt = jax.jit(lambda q, k, v: _flash_kv_tiled(
            q, k, v, None, scale, KV_TILED_TQ, KV_TILED_TK, False))
        xa = jax.jit(lambda q, k, v: xla_attention(q, k, v, scale=scale))

        dt_k = bench(kt, (q, k, v))
        dt_x = bench(xa, (q, k, v))
        fl = 2 * 2 * b * h * lq * lk * d
        print(f"{label}:")
        print(f"  kv-tiled kernel: {dt_k*1e3:8.2f} ms  {fl/dt_k/1e12:6.1f} TF/s")
        print(f"  xla fallback:    {dt_x*1e3:8.2f} ms  {fl/dt_x/1e12:6.1f} TF/s"
              f"  (kernel {dt_x/dt_k:.2f}x)")


if __name__ == "__main__":
    main()
