"""Perf lab: isolate ViT-g forward variants on the real chip.

Round-2 MFU work (VERDICT item 1). Each variant times the 40-layer EVA-g
forward at the bench workload shape (112 frames of 257x1408 by default) with
honest host-readback timing, printing ms/step and effective TF/s.

Usage: python scripts/perf_lab.py [variant ...]
Variants: base barrier batch224 batch56 attn_xla
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

import jax
import jax.numpy as jnp
import numpy as np


def vit_flops(b, cfg):
    l = cfg.seq_len
    w = cfg.width
    h = cfg.mlp_hidden
    per_layer = 2 * l * w * (3 * w) + 2 * l * w * w  # qkv + proj
    per_layer += 2 * 2 * l * l * w                   # qk + pv (all heads)
    per_layer += 2 * 2 * l * w * h                   # fc1 + fc2
    return b * (cfg.layers * per_layer + 2 * l * w * (3 * cfg.patch_size**2))


def run_variant(name: str, b: int = 112, attn_impl: str = "auto",
                barrier: bool = False, ln_bf16: bool = False,
                folded: bool = False, cls_split: bool = False,
                fused_qkv: bool = False, fused_proj: bool = False,
                fused_ln: bool = False):
    from mico_tpu import config as cfg_mod
    from mico_tpu.models import eva_vit
    from mico_tpu.ops import flash_attention as fa
    from mico_tpu.ops import layers

    layers.BARRIER_AFTER_LN = barrier
    layers.LN_STATS_DTYPE = jnp.bfloat16 if ln_bf16 else jnp.float32
    fa.PACKED_CLS_SPLIT = cls_split
    fa.FUSED_QKV_PROJ = fused_qkv
    fa.FUSED_ATTN_PROJ = fused_proj
    fa.FUSED_LN_QKV = fused_ln
    try:
        _run_variant(name, b, attn_impl, folded)
    finally:
        # restore the globals even when a variant raises (OOM/compile):
        # later variants in the same process must not inherit them
        layers.BARRIER_AFTER_LN = False
        layers.LN_STATS_DTYPE = jnp.float32
        fa.PACKED_CLS_SPLIT = False
        fa.FUSED_QKV_PROJ = True
        fa.FUSED_ATTN_PROJ = False
        fa.FUSED_LN_QKV = False


def _run_variant(name, b, attn_impl, folded):
    from mico_tpu import config as cfg_mod
    from mico_tpu.models import eva_vit

    cfg = cfg_mod.eva_config_for_encoder_type("evaclip01_giant")
    params = eva_vit.init_eva_vit(jax.random.PRNGKey(0), cfg)
    if folded:
        params = eva_vit.fold_inference_params(params, cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    @jax.jit
    def fwd(params, pixels):
        out = eva_vit.eva_vit_forward(
            params, cfg, pixels, compute_dtype=jnp.bfloat16,
            attn_impl=attn_impl,
        )
        return out, out.astype(jnp.float32).sum()

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((b, 3, 224, 224)), jnp.bfloat16)

    out = fwd(params, pixels)
    jax.block_until_ready(out)
    float(out[-1])

    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, pixels)
    jax.block_until_ready(out)
    float(out[-1])
    dt = (time.perf_counter() - t0) / n

    fl = vit_flops(b, cfg)
    print(f"{name:14s} B={b:4d} {dt*1e3:8.2f} ms/step  "
          f"{fl/dt/1e12:6.1f} TF/s  {b/dt:7.1f} frames/s", flush=True)


VARIANTS = {
    "base": dict(),
    "barrier": dict(barrier=True),
    "batch224": dict(b=224),
    "batch224_bar": dict(b=224, barrier=True),
    "batch56": dict(b=56),
    "batch168": dict(b=168),
    "attn_xla": dict(attn_impl="xla"),
    "attn_cls_split": dict(cls_split=True),
    "ln_bf16": dict(ln_bf16=True),
    "folded": dict(folded=True),
    # round-4 VERDICT #3: qkv projection fused INTO the packed attention
    # kernel (weight VMEM-resident; no (B,L,3W) HBM round-trip)
    "fused_qkv": dict(fused_qkv=True),
    "fused_qkv_b224": dict(fused_qkv=True, b=224),
    # both projections in-kernel (qkv + attention out-proj)
    "fused_proj": dict(fused_qkv=True, fused_proj=True),
    # LN + qkv + attention in one kernel (normalized tensor never in HBM)
    "fused_ln": dict(fused_qkv=True, fused_ln=True),
}


if __name__ == "__main__":
    names = sys.argv[1:] or ["base"]
    for nm in names:
        run_variant(nm, **VARIANTS[nm])
