"""Training-step benchmark: ViT-g cap%tv train step, bf16, realistic batch.

Measures train samples/s + model FLOPs utilization (VERDICT round-1 item 2:
the reference's reason to exist is pretraining — 300k steps @ b64K,
/root/reference/README.md:7,61 — so the train step needs a published number).

Usage: python scripts/train_bench.py [--xla-bwd] [--batch N] [--frames N]
       [--task cap%tv] [--remat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

import jax
import jax.numpy as jnp
import numpy as np


def analytic_train_flops(b, n_frames, cap_len, cfg, bert):
    """matmul flops: forward x3 (one fwd + ~2x in bwd)."""
    l, w, h, d = cfg.seq_len, cfg.width, cfg.mlp_hidden, cfg.layers
    vit_fwd = b * n_frames * d * (
        2 * l * w * (4 * w) + 2 * 2 * l * l * w + 2 * 2 * l * w * h
    )
    # BERT-base: self-attn + cross-attn over n_frames*257 cond tokens + FFN
    bw, bl, bd = bert.hidden_size, cap_len, bert.num_hidden_layers
    cond = n_frames * l
    bert_fwd = b * bd * (
        2 * bl * bw * (4 * bw)            # qkv + proj (self)
        + 2 * 2 * bl * bl * bw            # self scores+pv
        + 2 * bl * bw * bw + 2 * cond * bw * bw * 2   # cross q + cross kv
        + 2 * 2 * bl * cond * bw          # cross scores+pv
        + 2 * 2 * bl * bw * bert.intermediate_size
    )
    return 3 * (vit_fwd + bert_fwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xla-bwd", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--task", default="cap%tv")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-policy", default=None)
    ap.add_argument("--steps", type=int, default=4)
    # Single-chip reality: fp32 params + fp32 Adam moments for 1.3B are
    # ~16 GB — the whole HBM. The single-chip bench trains bf16 state
    # (multi-chip runs keep fp32 via ZeRO-1 sharding of the moments).
    ap.add_argument("--param-dtype", default="bfloat16")
    args = ap.parse_args()

    from mico_tpu.config import MiCoConfig
    from mico_tpu.models.mico import init_mico
    from mico_tpu.ops import flash_attention as fa
    from mico_tpu.train.optim import OptimConfig, build_optimizer
    from mico_tpu.train.train_step import make_train_step

    fa.PALLAS_BWD = not args.xla_bwd

    cfg = MiCoConfig(
        vision_encoder_type="evaclip01_giant",
        compute_dtype="bfloat16",
        max_vision_sample_num=args.frames,
        use_flash_attention=True,
        checkpointing=args.remat,
        remat_policy=args.remat_policy,
    )
    params = init_mico(jax.random.PRNGKey(0), cfg)
    pdt = jnp.dtype(args.param_dtype)
    params = jax.tree.map(
        lambda x: x.astype(pdt) if x.dtype == jnp.float32 else x, params
    )
    opt = build_optimizer(params, OptimConfig(num_train_steps=1000))
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, args.task, donate=True)

    b = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "vision_pixels": jnp.asarray(
            rng.standard_normal((b, args.frames, 3, 224, 224)), jnp.bfloat16
        ),
        "caption_ids": jnp.asarray(
            rng.integers(200, 20000, (b, cfg.max_caption_len)), jnp.int32
        ),
        "caption_mask": jnp.ones((b, cfg.max_caption_len), jnp.int32),
    }

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, opt_state, losses = step(params, opt_state, batch, key)
    jax.block_until_ready(losses)
    lt = float(losses["loss_total"])
    print(f"compile+step0 {time.perf_counter()-t0:.1f}s loss={lt:.4f}",
          flush=True)

    t0 = time.perf_counter()
    for i in range(args.steps):
        key = jax.random.fold_in(key, i)
        params, opt_state, losses = step(params, opt_state, batch, key)
    jax.block_until_ready(losses)
    float(losses["loss_total"])
    dt = (time.perf_counter() - t0) / args.steps

    fl = analytic_train_flops(
        b, args.frames, cfg.max_caption_len, cfg.eva_config, cfg.bert_config
    )
    mode = "xla-bwd" if args.xla_bwd else "pallas-bwd"
    print(
        f"train {args.task} b={b} frames={args.frames} remat={args.remat} "
        f"[{mode}]: {dt*1e3:.1f} ms/step  {b/dt:.2f} samples/s  "
        f"{fl/dt/1e12:.1f} TF/s  MFU={fl/dt/197e12*100:.1f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
