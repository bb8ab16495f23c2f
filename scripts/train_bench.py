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
    """matmul flops for the cap%tv step: forward x3 (one fwd + ~2x bwd)."""
    return mix_train_flops(
        b, cfg, bert, "cap%tv",
        n_frames=n_frames, n_audio=0, n_depth=0,
        cap_len=cap_len, sub_len=0, q_len=0, ans_len=0,
    )


def mix_train_flops(b, cfg, bert, task, *, n_frames, n_audio, n_depth,
                    cap_len, sub_len, q_len, ans_len, itm_dedup=False):
    """Analytic matmul FLOPs for an arbitrary reference task mix, matching
    the memoized-feature execution (each tower runs ONCE per step —
    objectives.task_losses / reference batch_get):

      towers:   shared ViT over vision+audio+depth frames; BERT subtitle
                pass when 's' appears in any group
      per sub:  ITC text-feature pass; ITM 3×bs cross-attn pass per group;
                CAP masked-LM pass per group; QA part-causal pass per group
    ×3 for the backward."""
    l, w, h, d = cfg.seq_len, cfg.width, cfg.mlp_hidden, cfg.layers
    bw, bd, bi = bert.hidden_size, bert.num_hidden_layers, bert.intermediate_size

    def vit(frames):
        return frames * d * (
            2 * l * w * (4 * w) + 2 * 2 * l * l * w + 2 * 2 * l * w * h
        )

    def bert_pass(rows, seq, cond, kv_rows=None):
        """kv_rows: rows actually paying the cross-K/V projections (the
        ITM dedup projects once per UNIQUE condition row, then gathers)."""
        per_layer = (
            2 * seq * bw * (4 * bw)           # self qkv + proj
            + 2 * 2 * seq * seq * bw          # self scores + pv
            + 2 * seq * bw * bi * 2           # FFN
        )
        fl = rows * bd * per_layer
        if cond:
            per_cross = (
                2 * seq * bw * bw             # cross q
                + 2 * 2 * seq * cond * bw     # cross scores + pv
                + 2 * seq * bw * bw           # cross out
            )
            fl += rows * bd * per_cross
            fl += (kv_rows if kv_rows is not None else rows) * bd * (
                2 * cond * bw * bw * 2        # cross k/v projections
            )
        return fl

    subs = [s.split("%") for s in task.split("_")]
    all_groups = {g for _, *gs in subs for g in gs}
    mods_used = {m for g in all_groups for m in g[1:]}

    def cond_tokens(group):
        per = {"v": n_frames * l, "i": n_frames * l, "a": n_audio * l,
               "d": n_depth * l, "s": sub_len}
        return sum(per[m] for m in group[1:])

    fl = 0
    # towers, once (memoized batch_get)
    tower_frames = 0
    if mods_used & {"v", "i"}:
        tower_frames += n_frames
    if "a" in mods_used:
        tower_frames += n_audio
    if "d" in mods_used:
        tower_frames += n_depth
    fl += b * vit(tower_frames)
    if "s" in mods_used:
        fl += bert_pass(b, sub_len, 0)

    for kind, *groups in subs:
        if kind == "ret":
            fl += bert_pass(b, cap_len, 0)            # ITC text feature
            for g in groups:                          # ITM 3×bs per group
                fl += bert_pass(3 * b, cap_len, cond_tokens(g),
                                kv_rows=b if itm_dedup else None)
        elif kind == "cap":
            for g in groups:
                fl += bert_pass(b, cap_len, cond_tokens(g))
        elif kind == "qa":
            for g in groups:
                fl += bert_pass(b, q_len + ans_len, cond_tokens(g))
    return 3 * fl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xla-bwd", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--task", default="cap%tv")
    ap.add_argument("--mix", action="store_true",
                    help="the production pretraining mix "
                         "(ret%%tva%%tid_cap%%tvas_qa%%tva — the "
                         "MULTICHIP dryrun task) at the given batch")
    ap.add_argument("--audio-slices", type=int, default=2)
    ap.add_argument("--bert-unroll", action="store_true",
                    help="python-unroll the BERT layer march (per-layer "
                         "grad buffers vs the scan's stacked-buffer "
                         "update-slice copies)")
    ap.add_argument("--scst-finetune-encoder", action="store_true",
                    help="SCST recomputes the condition towers under grad "
                         "in the update (default reuses the rollout's "
                         "features; encoder runs once per step)")
    ap.add_argument("--long-context", action="store_true",
                    help="32-frame condition (8224 cross tokens) + 128-token "
                         "packed-query captioning: the shape whose training "
                         "backward the KV-tiled Pallas kernels serve "
                         "(Lq >= KV_TILED_MIN_Q, Lk > MAX_RESIDENT_KV); "
                         "A/B with --xla-bwd")
    ap.add_argument("--cap-len", type=int, default=None,
                    help="override max_caption_len (training query length)")
    ap.add_argument("--fused-qkv", default="on", choices=["on", "off"],
                    help="qkv projection inside the packed attention "
                         "kernel (round-4 measured default) vs the "
                         "separate-projection route")
    ap.add_argument("--itm-dedup", default="off", choices=["on", "off"],
                    help="project ITM cross-K/V once per unique condition "
                         "row (on) vs the reference-shaped 3xbs duplicated "
                         "projections (off = the measured-and-deployed "
                         "default, ITM_DEDUP_CROSS_KV=False); MFU is "
                         "computed on the FLOPs actually executed by the "
                         "chosen mode")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-policy", default=None)
    ap.add_argument("--unroll-blocks", action="store_true",
                    help="python-unroll the ViT layer march (emits "
                         "per-layer grad buffers instead of the scan's "
                         "stacked-buffer update-slice copies; slow compile)")
    ap.add_argument("--no-bert-remat", action="store_true",
                    help="keep the BERT branch remat-free while the ViT "
                         "remats (bert_checkpointing=False)")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--no-dropout", action="store_true",
                    help="A/B diagnosis: identity dropout (isolates the "
                         "cost of train-time random-mask generation)")
    ap.add_argument("--rng-impl", default=None,
                    choices=["threefry2x32", "rbg"],
                    help="jax_default_prng_impl for the step rng (rbg uses "
                         "the TPU RngBitGenerator — far cheaper mask draws)")
    ap.add_argument("--profile", default="",
                    help="capture a jax.profiler trace of the timed steps "
                         "into this logdir (summarize with "
                         "scripts/trace_summary.py)")
    # Single-chip reality: fp32 params + fp32 Adam moments for 1.3B are
    # ~16 GB — the whole HBM. The single-chip bench trains bf16 state
    # (multi-chip runs keep fp32 via ZeRO-1 sharding of the moments).
    ap.add_argument("--param-dtype", default="bfloat16")
    args = ap.parse_args()

    if args.rng_impl:
        jax.config.update("jax_default_prng_impl", args.rng_impl)

    from mico_tpu.config import MiCoConfig
    from mico_tpu.models.mico import init_mico
    from mico_tpu.ops import flash_attention as fa
    from mico_tpu.ops import layers as op_layers
    from mico_tpu.train.optim import OptimConfig, build_optimizer
    from mico_tpu.train.train_step import make_train_step

    fa.PALLAS_BWD = not args.xla_bwd
    fa.FUSED_QKV_PROJ = args.fused_qkv == "on"
    op_layers.DROPOUT_ENABLED = not args.no_dropout
    from mico_tpu.train import objectives as objectives_mod

    objectives_mod.ITM_DEDUP_CROSS_KV = args.itm_dedup == "on"
    if args.bert_unroll:
        from mico_tpu.models import bert as bert_mod

        bert_mod.BERT_UNROLL = True
    if args.mix:
        args.task = "ret%tva%tid_cap%tvas_qa%tva"
    if args.long_context:
        args.frames = 32
        if args.cap_len is None:
            args.cap_len = 128

    cfg = MiCoConfig(
        vision_encoder_type="evaclip01_giant",
        compute_dtype="bfloat16",
        max_vision_sample_num=args.frames,
        max_audio_sample_num=args.audio_slices,
        max_depth_sample_num=args.frames,
        use_flash_attention=True,
        checkpointing=args.remat,
        bert_checkpointing=False if args.no_bert_remat else None,
        remat_policy=args.remat_policy,
        unroll_blocks=args.unroll_blocks,
        **({"max_caption_len": args.cap_len} if args.cap_len else {}),
    )
    params = init_mico(jax.random.PRNGKey(0), cfg)
    pdt = jnp.dtype(args.param_dtype)
    params = jax.tree.map(
        lambda x: x.astype(pdt) if x.dtype == jnp.float32 else x, params
    )
    opt = build_optimizer(params, OptimConfig(num_train_steps=1000))
    opt_state = opt.init(params)
    is_scst = args.task.startswith("scst")
    if is_scst:
        # SCST throughput (round-3 VERDICT next #6): the full
        # rollout -> host CIDEr-D -> REINFORCE-update loop, encoder
        # memoized between rollout and update (train/scst.py); A/B the
        # double-encoder variant with --scst-finetune-encoder
        from mico_tpu.text import BertWordPieceTokenizer
        from mico_tpu.train.scst import make_scst_step

        tok = BertWordPieceTokenizer(
            "/root/reference/model/tokenizer/vocab.txt"
        )
        scst_step = make_scst_step(
            cfg, opt, args.task, tok,
            finetune_encoder=args.scst_finetune_encoder,
        )
        refs = ["a man is playing a guitar on stage"] * args.batch

        def step(p, o, batch, key):
            return scst_step(p, o, batch, key, refs)
    else:
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
    mods_used = {m for sub in args.task.split("_")
                 for g in sub.split("%")[1:] for m in g[1:]}
    q_len, ans_len = 25, 6
    if "a" in mods_used:
        batch["audio_spectrograms"] = jnp.asarray(
            rng.standard_normal((b, args.audio_slices, 224, 224)),
            jnp.bfloat16,
        )
    if "d" in mods_used:
        batch["depth_pixels"] = jnp.asarray(
            rng.standard_normal((b, args.frames, 3, 224, 224)), jnp.bfloat16
        )
    if "s" in mods_used:
        batch["subtitle_ids"] = jnp.asarray(
            rng.integers(200, 20000, (b, cfg.max_subtitle_len)), jnp.int32
        )
        batch["subtitle_mask"] = jnp.ones((b, cfg.max_subtitle_len), jnp.int32)
    if "qa" in args.task:
        batch["question_ids"] = jnp.asarray(
            rng.integers(200, 20000, (b, q_len)), jnp.int32
        )
        batch["question_mask"] = jnp.ones((b, q_len), jnp.int32)
        batch["answer_ids"] = jnp.asarray(
            rng.integers(200, 20000, (b, ans_len)), jnp.int32
        )
        batch["answer_mask"] = jnp.ones((b, ans_len), jnp.int32)

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, opt_state, losses = step(params, opt_state, batch, key)
    jax.block_until_ready(losses)
    lt = float(losses.get("loss_total", losses.get("loss_scst", 0.0)))
    print(f"compile+step0 {time.perf_counter()-t0:.1f}s loss={lt:.4f}",
          flush=True)

    prof = None
    if args.profile:
        from mico_tpu.utils import profiling

        prof = profiling.trace(args.profile)
        prof.__enter__()
    t0 = time.perf_counter()
    for i in range(args.steps):
        key = jax.random.fold_in(key, i)
        params, opt_state, losses = step(params, opt_state, batch, key)
    jax.block_until_ready(losses)
    if prof is not None:
        prof.__exit__(None, None, None)
    float(losses.get("loss_total", losses.get("loss_scst", 0.0)))
    dt = (time.perf_counter() - t0) / args.steps

    if is_scst:
        enc = ("finetune-enc" if args.scst_finetune_encoder
               else "memoized-enc")
        print(
            f"train {args.task} b={b} frames={args.frames} [{enc}]: "
            f"{dt*1e3:.1f} ms/step  {b/dt:.2f} samples/s",
            flush=True,
        )
        return

    fl = mix_train_flops(
        b, cfg.eva_config, cfg.bert_config, args.task,
        n_frames=args.frames,
        n_audio=args.audio_slices if "a" in mods_used else 0,
        n_depth=args.frames if "d" in mods_used else 0,
        cap_len=cfg.max_caption_len,
        sub_len=cfg.max_subtitle_len if "s" in mods_used else 0,
        q_len=q_len, ans_len=ans_len,
        itm_dedup=args.itm_dedup == "on",
    )
    mode = "xla-bwd" if args.xla_bwd else "pallas-bwd"
    if args.long_context:
        mode += ",long-context"
    if "ret" in args.task:
        mode += f",itm-dedup-{args.itm_dedup}"
    if args.bert_unroll:
        mode += ",bert-unroll"
    if args.no_dropout:
        mode += ",no-dropout"
    if args.rng_impl:
        mode += f",{args.rng_impl}"
    print(
        f"train {args.task} b={b} frames={args.frames} remat={args.remat} "
        f"[{mode}]: {dt*1e3:.1f} ms/step  {b/dt:.2f} samples/s  "
        f"{fl/dt/1e12:.1f} TF/s  MFU={fl/dt/197e12*100:.1f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
