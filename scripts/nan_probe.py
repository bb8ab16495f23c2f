"""Bisect the first-update NaN found by the round-5 soak (scripts/soak.py).

Mirrors `mico_tpu.run` setup exactly (same config JSON, same loaders, same
bf16 param cast, same task_losses), but instead of the optimizer step it
computes per-subtask losses and raw grads for N batches and reports, per
batch:

  - every loss term and whether it is finite
  - per top-level param subtree: count of non-finite grad elements
  - the global grad norm (what clip_by_global_norm would see)

Bisect knobs: --task (e.g. ret%tva / ret%tid / cap%tvas / qa%tva vs the
full mix), --no-flash (route all attention through the XLA path),
--compute-dtype / --param-dtype, --rng-impl.

Usage (chip):
  python scripts/nan_probe.py --config /tmp/mico_soak/corpus/soak_config.json \
      --vocab /root/reference/model/tokenizer/vocab.txt --n-batches 2
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--vocab", default="/root/reference/model/tokenizer/vocab.txt")
    ap.add_argument("--task", default=None,
                    help="override the config's task string")
    ap.add_argument("--n-batches", type=int, default=1)
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--param-dtype", default=None)
    ap.add_argument("--compute-dtype", default=None)
    ap.add_argument("--rng-impl", default="rbg")
    ap.add_argument("--fwd-only", action="store_true",
                    help="losses only, skip the backward pass")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from mico_tpu.config import mico_config_from_dict
    from mico_tpu.data import create_train_dataloaders
    from mico_tpu.data.tokenize_collate import BatchTokenizer
    from mico_tpu.models import mico as mico_mod
    from mico_tpu.text import BertWordPieceTokenizer
    from mico_tpu.train.objectives import task_losses
    from mico_tpu.utils.config_io import load_layered_config

    jax.config.update("jax_default_prng_impl", args.rng_impl)

    cfg_args = load_layered_config(args.config, argv=[])
    run_cfg, model_cfg = cfg_args.run_cfg, cfg_args.model_cfg
    if args.no_flash:
        model_cfg["use_flash_attention"] = False
    if args.compute_dtype:
        model_cfg["compute_dtype"] = args.compute_dtype
    if args.task:
        for d in cfg_args.data_cfg["train"]:
            d["task"] = args.task

    cfg = mico_config_from_dict(dict(model_cfg))
    pd = args.param_dtype or run_cfg.get("param_dtype")
    pd = jnp.dtype(pd) if pd else None

    params = mico_mod.init_mico(
        jax.random.PRNGKey(int(run_cfg.get("seed", 50))), cfg
    )
    if pd is not None:
        params = jax.tree.map(
            lambda x: x.astype(pd) if x.dtype == jnp.float32 else x, params
        )
    print(f"params ready (dtype={pd}), backend={jax.default_backend()}",
          flush=True)

    tokenizer = BertWordPieceTokenizer(args.vocab)
    batch_tok = BatchTokenizer(
        tokenizer,
        max_caption_len=cfg.max_caption_len,
        max_omni_caption_len=cfg.max_omni_caption_len,
        max_subtitle_len=cfg.max_subtitle_len,
    )
    meta_loader = create_train_dataloaders(cfg_args)

    def loss_and_grads(p, batch, rng, task):
        def loss_fn(pp):
            losses = task_losses(rng, pp, cfg, batch, task, axis_name=None)
            return sum(losses.values()), losses

        if args.fwd_only:
            total, losses = loss_fn(p)
            return losses | {"loss_total": total}, None
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        return losses | {"loss_total": total}, grads

    jitted = {}
    rng = jax.random.PRNGKey(args.seed)
    n_done = 0
    for name, batch in iter(meta_loader):
        if n_done >= args.n_batches:
            break
        task = name.split("--")[0]
        tb = batch_tok(batch, task)
        arrays = {k: jnp.asarray(v) for k, v in tb.items()
                  if not isinstance(v, list)}
        if task not in jitted:
            jitted[task] = jax.jit(loss_and_grads, static_argnames=("task",))
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        losses, grads = jitted[task](params, arrays, sub, task)
        losses = {k: float(v) for k, v in losses.items()}
        print(f"\n=== batch {n_done} task={task} ({time.time()-t0:.1f}s)",
              flush=True)
        for k, v in sorted(losses.items()):
            import math
            flag = "" if math.isfinite(v) else "   <-- NON-FINITE"
            print(f"  {k}: {v:.6f}{flag}")
        if grads is not None:
            # non-finite counts per top-level subtree
            import collections
            bad = collections.Counter()
            total_bad = 0
            gnorm_sq = 0.0

            flat = jax.tree_util.tree_flatten_with_path(grads)[0]
            # batch the device work: one count per leaf
            for path, g in flat:
                top = str(getattr(path[0], "key", path[0]))
                nb = int(jnp.sum(~jnp.isfinite(g)))
                gnorm_sq += float(jnp.sum(jnp.square(g.astype(jnp.float32))))
                if nb:
                    bad[top] += nb
                    total_bad += nb
                    if bad[top] == nb:  # first bad leaf in this subtree
                        print(f"  first bad leaf in {top}: "
                              f"{'/'.join(str(getattr(k,'key',k)) for k in path)}"
                              f" shape={g.shape} nonfinite={nb}")
            print(f"  grad global norm: {gnorm_sq ** 0.5:.6e}")
            if total_bad:
                print("  NON-FINITE GRADS per top-level subtree:")
                for k, v in bad.most_common():
                    print(f"    {k}: {v}")
            else:
                print("  all grads finite")
        n_done += 1
    print("\nprobe done", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
