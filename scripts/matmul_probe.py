"""Probe per-shape matmul rooflines with chained ops in ONE program
(per-program dispatch through the tunnel costs ~2ms; chaining amortizes it,
matching how the real 40-layer forward executes)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

import jax
import jax.numpy as jnp
import numpy as np

DEPTH = 8


def probe(m, k, n, prec, dtype=jnp.bfloat16, n_iter=4, label=""):
    """Chain DEPTH pairs of (m,k)x(k,n) then (m,n)x(n,k) matmuls."""

    @jax.jit
    def f(x, w1s, w2s):
        def body(x, ws):
            w1, w2 = ws
            h = jnp.dot(x, w1, preferred_element_type=jnp.float32,
                        precision=prec).astype(dtype)
            y = jnp.dot(h, w2, preferred_element_type=jnp.float32,
                        precision=prec).astype(dtype)
            return y, None

        y, _ = jax.lax.scan(body, x, (w1s, w2s))
        return y, y.astype(jnp.float32)[0, 0]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.02, dtype)
    w1s = jnp.asarray(rng.standard_normal((DEPTH, k, n)) * 0.02, dtype)
    w2s = jnp.asarray(rng.standard_normal((DEPTH, n, k)) * 0.02, dtype)
    out = f(x, w1s, w2s)
    jax.block_until_ready(out)
    float(out[-1])
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f(x, w1s, w2s)
    jax.block_until_ready(out)
    float(out[-1])
    dt = (time.perf_counter() - t0) / n_iter
    tf = 2 * 2 * DEPTH * m * k * n / dt / 1e12
    print(f"({m:6d},{k:5d},{n:5d}) {label:10s} {str(prec):8s} "
          f"{dt*1e3:8.3f} ms  {tf:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    H = jax.lax.Precision.HIGHEST
    D = jax.lax.Precision.DEFAULT
    shapes = [
        (28784, 1408, 6144, "fc1/fc2"),
        (28784, 1408, 4224, "qkv-ish"),
        (28784, 1408, 1408, "proj"),
        (8192, 8192, 8192, "roofline"),
    ]
    for m, k, n, label in shapes:
        for prec in (D, H):
            probe(m, k, n, prec, label=label)
