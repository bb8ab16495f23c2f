"""Tracing / profiling utilities.

The reference ships no profiling (SURVEY §5.1: only leftover ipdb imports, an
unused `verbose_time` flag at data/utils/pipeline.py:17, and Swin's analytic
`flops()` at model/swin.py:161-173). This module is the TPU-native
observability layer:

  - `trace(logdir)`: context manager around `jax.profiler` — produces an
    xprof/tensorboard-loadable trace of XLA ops, DMA, and host activity.
  - `annotate(name)` / `annotate_fn`: TraceAnnotation scopes that show up as
    named spans inside the device trace.
  - `StepTimer`: wall-clock step timing with device-sync readback (the
    tunneled single-chip platform acks async dispatch, so honest timing
    must read a scalar back — see bench.py).
  - analytic FLOPs helpers for the flagship towers (the Swin-`flops()`
    capability, generalized).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace into `logdir` (view with xprof /
    tensorboard-profile)."""
    options = jax.profiler.ProfileOptions()
    options.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(logdir, profiler_options=options)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span in the device trace (wrap compute dispatch sites)."""
    return jax.profiler.TraceAnnotation(name)


def annotate_fn(fn=None, *, name: Optional[str] = None):
    """Decorator form of `annotate`."""
    if fn is None:
        return functools.partial(annotate_fn, name=name)

    label = name or fn.__name__

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.profiler.TraceAnnotation(label):
            return fn(*args, **kwargs)

    return wrapped


class StepTimer:
    """Running mean/last step time with explicit device synchronization.

    >>> timer = StepTimer()
    >>> with timer:
    ...     out = step(params, batch)
    ...     timer.sync(out)          # host readback → honest timing
    >>> timer.last_ms, timer.mean_ms
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.n = 0
        self.total = 0.0
        self.last = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def sync(self, out) -> None:
        leaves = jax.tree.leaves(out)
        if leaves:
            jax.block_until_ready(leaves)
            # force one scalar through the host: async-ack transports
            # (tunneled chips) complete only on readback
            float(leaves[0].reshape(-1)[0])

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.last = dt
        if self.n >= self.warmup:
            self.total += dt
        self.n += 1
        return False

    @property
    def last_ms(self) -> float:
        return self.last * 1e3

    @property
    def mean_ms(self) -> float:
        steps = max(self.n - self.warmup, 1)
        return self.total / steps * 1e3


# ---------------------------------------------------------------------------
# Analytic FLOPs (fwd, multiply-accumulate = 2 FLOPs)
# ---------------------------------------------------------------------------


def vit_flops(layers: int, width: int, seq_len: int, mlp_hidden: int) -> int:
    """Per-image forward FLOPs of a ViT trunk (attention scores included)."""
    per_tok = 4 * width * width + 2 * width * mlp_hidden
    attn = 2 * seq_len * width
    return 2 * layers * seq_len * (per_tok + attn)


def eva_vit_flops(cfg, n_frames: int = 1) -> int:
    """cfg: EvaVitConfig → forward FLOPs for n_frames frames."""
    return n_frames * vit_flops(
        cfg.layers, cfg.width, cfg.seq_len, cfg.mlp_hidden
    )


def bert_flops(layers: int, hidden: int, seq_len: int, intermediate: int,
               cross_len: int = 0) -> int:
    """BERT(+cross-attention) forward FLOPs per sequence."""
    per_tok = 4 * hidden * hidden + 2 * hidden * intermediate
    attn = 2 * seq_len * hidden
    xattn = (2 * hidden * hidden + 2 * cross_len * hidden) if cross_len else 0
    return 2 * layers * seq_len * (per_tok + attn + xattn)
