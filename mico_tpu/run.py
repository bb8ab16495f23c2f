"""Training / testing CLI entry.

Capability parity with the reference entry (data/run.py:13-63):

    python -m mico_tpu.run --config <experiment.json> \
        [--pretrain_dir DIR] [--output_dir DIR] [run_cfg.mode=testing] [k=v ...]

get_args (layered JSON + k=v CLI overrides) → initialize (seeds, logging,
optional jax.distributed) → dataloaders → model (init | pretrain_dir |
resume) → optimizer → train() or test().

TPU-native: one `Mesh` over all devices; params/opt-state sharded by the
partition rules; per-host data loading; the reference's torchrun/NCCL launch
(data/scripts/run_vision_captioner.sh) becomes one process per host with
`jax.distributed.initialize` when `run_cfg.multihost=true`.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import jax
import numpy as np

from mico_tpu.config import mico_config_from_dict
from mico_tpu.data import create_train_dataloaders, create_val_dataloaders
from mico_tpu.parallel.mesh import create_mesh
from mico_tpu.pipeline import test, train
from mico_tpu.text import BertWordPieceTokenizer
from mico_tpu.train.checkpoints import (
    load_from_pretrained_dir,
    resume_latest,
    resume_latest_sharded,
)
from mico_tpu.train.optim import OptimConfig, build_optimizer
from mico_tpu.train.train_step import shard_train_state, train_state_shardings
from mico_tpu.utils.config_io import dump_hps, load_layered_config
from mico_tpu.utils.logger import LOGGER, add_log_to_file

DEFAULT_VOCAB = os.path.join(
    os.path.dirname(__file__), "assets", "vocab.txt"
)


def initialize(run_cfg) -> None:
    """Seeds + logging + optional multi-host init
    (reference data/utils/initialize.py:8-36)."""
    if run_cfg.get("multihost"):
        # On TPU pods every arg auto-detects. Off-pod (or under a launcher
        # jax can't sniff) the knobs mirror torchrun's MASTER_ADDR /
        # WORLD_SIZE / RANK env contract the reference relies on
        # (data/utils/initialize.py:8-16).
        kw = {}
        if run_cfg.get("coordinator_address"):
            kw["coordinator_address"] = run_cfg["coordinator_address"]
        if run_cfg.get("num_processes") is not None:
            kw["num_processes"] = int(run_cfg["num_processes"])
        if run_cfg.get("process_id") is not None:
            kw["process_id"] = int(run_cfg["process_id"])
        jax.distributed.initialize(**kw)
    # Train-time randomness (dropout masks, DropPath, TokenMasker draws)
    # defaults to the TPU hardware RngBitGenerator: threefry mask generation
    # alone measured 5% of the production-mix train step (scripts/
    # train_bench.py --rng-impl A/B, BASELINE round 3). Override with
    # run_cfg.rng_impl="threefry2x32" for cross-backend-identical streams.
    jax.config.update(
        "jax_default_prng_impl", run_cfg.get("rng_impl", "rbg")
    )
    seed = int(run_cfg.get("seed", 50)) + jax.process_index()
    random.seed(seed)
    np.random.seed(seed)
    out = run_cfg.get("output_dir")
    if out and jax.process_index() == 0:
        os.makedirs(os.path.join(out, "log"), exist_ok=True)
        os.makedirs(os.path.join(out, "ckpt"), exist_ok=True)
        add_log_to_file(os.path.join(out, "log", "log.txt"))


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--pretrain_dir", default=None)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--vocab", default=None)
    known, overrides = parser.parse_known_args(argv)
    args = load_layered_config(known.config, argv=overrides)
    if known.pretrain_dir:
        args.run_cfg["pretrain_dir"] = known.pretrain_dir
    if known.output_dir:
        args.run_cfg["output_dir"] = known.output_dir
    args.run_cfg.setdefault("output_dir", "./output")
    args["_vocab"] = known.vocab
    return args


def main(argv=None):
    args = get_args(argv)
    run_cfg, model_cfg = args.run_cfg, args.model_cfg
    if run_cfg.get("platform"):
        # must land before the first backend query; the axon TPU plugin
        # ignores JAX_PLATFORMS, so set the live config too
        jax.config.update("jax_platforms", run_cfg["platform"])
    initialize(run_cfg)
    if jax.process_index() == 0:
        dump_hps(
            {k: v for k, v in args.items() if not k.startswith("_")},
            run_cfg["output_dir"],
        )

    vocab = args.get("_vocab") or run_cfg.get("vocab") or DEFAULT_VOCAB
    tokenizer = BertWordPieceTokenizer(vocab)

    # pipeline_stages>1 runs the ViT stack as a GPipe pipeline over the
    # `model` mesh axis (the same axis tensor parallelism uses; pick one)
    pp = int(run_cfg.get("pipeline_stages", 1))
    model_par = int(run_cfg.get("model_parallel", 1))
    if pp > 1:
        model_cfg["pipeline_stages"] = pp
        if run_cfg.get("pipeline_microbatches"):
            model_cfg["pipeline_microbatches"] = int(
                run_cfg["pipeline_microbatches"]
            )
        model_par = pp
    mesh = create_mesh(data=-1, model=model_par)
    LOGGER.info("mesh: %s over %d devices", mesh.shape, len(jax.devices()))

    meta_loader = create_train_dataloaders(args)
    val_loaders = create_val_dataloaders(args)

    # model: resume > pretrain_dir > fresh init
    cfg = mico_config_from_dict(dict(model_cfg))
    params = None
    resume_step = 0
    mode = run_cfg.get("mode", "training")
    # orbax checkpoints resume SHARDED in training mode: the restore is
    # deferred until the mesh shardings are known, and each device then
    # reads only its slice (checkpoints.resume_latest_sharded). Every
    # other layout takes the host-tree path below.
    sharded_resume = False
    if run_cfg.get("resume"):
        from mico_tpu.train.checkpoints import _latest_step

        _, latest = _latest_step(
            os.path.join(run_cfg["output_dir"], "ckpt"), "model"
        )
        if (latest and latest.endswith(".orbax")
                and mode == "training"):
            sharded_resume = True
        else:
            params, _, resume_step = resume_latest(run_cfg["output_dir"])
    if params is None and not sharded_resume and run_cfg.get("pretrain_dir"):
        params, cfg = load_from_pretrained_dir(
            run_cfg["pretrain_dir"],
            video_resolution=int(model_cfg.get("vision_resolution", 224)),
            config_overrides=dict(model_cfg),
        )
    from mico_tpu.models import mico as mico_mod

    # run_cfg.param_dtype="bfloat16": train with bf16 params (and hence
    # bf16 Adam moments). fp32 params + fp32 moments for the 1.3B flagship
    # exceed one chip's HBM — single-chip training REQUIRES this (the
    # multi-chip path keeps fp32 via ZeRO-1 sharding of the moments);
    # scripts/train_bench.py measures under the same cast.
    param_dtype = run_cfg.get("param_dtype")
    import jax.numpy as jnp

    pd = jnp.dtype(param_dtype) if param_dtype else None

    def _cast_params(tree):
        if pd is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(pd) if x.dtype == jnp.float32 else x, tree
        )

    init_rng = jax.random.PRNGKey(int(run_cfg.get("seed", 50)))
    if params is None and sharded_resume:
        # abstract template only — the real values stream from the
        # checkpoint straight onto the mesh
        params = jax.eval_shape(
            lambda: _cast_params(mico_mod.init_mico(init_rng, cfg))
        )
    elif params is None:
        params = _cast_params(mico_mod.init_mico(init_rng, cfg))
    else:
        # resume_latest / pretrain_dir host trees take the same cast
        params = _cast_params(params)

    if mode == "training":
        if meta_loader is None:
            raise ValueError("training mode requires data_cfg.train")
        frozen = tuple(
            pfx
            for flag, pfx in (
                ("frozen_vision", "vision_encoder"),
                ("frozen_audio", "audio_encoder"),
            )
            if model_cfg.get(flag)
        )
        opt_cfg = OptimConfig(
            learning_rate=float(run_cfg.get("learning_rate", 1e-4)),
            clip_lr=float(run_cfg.get("clip_lr", 5e-7)),
            new_lr=float(run_cfg.get("new_lr", 1e-5)),
            new_params_name=tuple(run_cfg.get("new_params_name", ())),
            frozen_prefixes=frozen,
            weight_decay=float(run_cfg.get("weight_decay", 0.01)),
            betas=tuple(run_cfg.get("betas", (0.9, 0.98))),
            grad_norm=float(run_cfg.get("grad_norm", 2.0)),
            scheduler=run_cfg.get("scheduler", "warmup_linear"),
            warmup_ratio=float(run_cfg.get("warmup_ratio", 0.1)),
            num_train_steps=int(run_cfg.get("num_train_steps", 100000)),
        )
        optimizer = build_optimizer(params, opt_cfg)
        accum = int(run_cfg.get("gradient_accumulation_steps", 1))
        if accum > 1:
            import optax

            optimizer = optax.MultiSteps(optimizer, every_k_schedule=accum)
        # under PP the `model` axis carries pipeline stages, not
        # Megatron TP shards: keep params replicated and let the
        # pipeline shard_map slice the stacked layer axis locally
        model_axis = None if pp > 1 else "model"
        zero1 = bool(run_cfg.get("zero1", False))
        if sharded_resume:
            # params is the abstract template here: derive the shardings,
            # then stream the checkpoint straight onto the mesh (each
            # device reads only its shard — no host-tree materialization)
            abstract_opt = jax.eval_shape(optimizer.init, params)
            p_sh, o_sh = train_state_shardings(
                mesh, params, abstract_opt, model_axis=model_axis,
                zero1=zero1,
            )
            params, opt_state, resume_step = resume_latest_sharded(
                run_cfg["output_dir"], params, p_sh, abstract_opt, o_sh
            )
            if params is None:
                raise FileNotFoundError(
                    f"resume requested but no orbax checkpoint under "
                    f"{run_cfg['output_dir']}/ckpt"
                )
            if opt_state is None:
                opt_state = jax.jit(
                    optimizer.init, out_shardings=o_sh
                )(params)
        else:
            opt_state = optimizer.init(params)
            if resume_step:
                # restore Adam moments + inner step so the LR schedule and
                # the checkpoint numbering continue where the run left off
                from mico_tpu.train.checkpoints import load_latest_opt_state

                restored = load_latest_opt_state(
                    run_cfg["output_dir"], opt_state
                )
                if restored is not None:
                    opt_state = restored
            params, opt_state = shard_train_state(
                mesh, params, opt_state, model_axis=model_axis, zero1=zero1,
            )
        if run_cfg.get("first_eval") and val_loaders:
            test(cfg, params, val_loaders, run_cfg, tokenizer)
        train(
            cfg, params, opt_state, optimizer, meta_loader, val_loaders,
            run_cfg, tokenizer, mesh=mesh, start_step=resume_step,
            model_axis=model_axis,
        )
    elif mode == "testing":
        logs = test(cfg, params, val_loaders, run_cfg, tokenizer)
        LOGGER.info("test results: %s", logs)
        return logs
    else:
        raise ValueError(f"unknown mode {mode}")


if __name__ == "__main__":
    main(sys.argv[1:])
