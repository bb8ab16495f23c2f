"""Train / test orchestration.

Capability parity with the reference pipeline (data/utils/pipeline.py:17-180):
  - train: iterate MetaLoader, per-task jit train step, RunningMeter EMA
    losses logged every 50 steps, periodic eval every `valid_steps` +
    checkpoint save, best-metric tracking (CIDEr / accuracy / video_r1).
  - test: run the evaluation registry once over the val loaders.

TPU-native differences: the LR schedule lives inside the optax optimizer
(no per-step param_group mutation, reference pipeline.py:75-78); gradient
accumulation is `optax.MultiSteps` (no autocast/GradScaler — bf16 natively);
gradient all-reduce is GSPMD's, not NCCL hooks (reference pipeline.py:92-99).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.config import MiCoConfig
from mico_tpu.data.tokenize_collate import BatchTokenizer
from mico_tpu.evaluation import Evaluator, evaluation_registry
from mico_tpu.train.checkpoints import ModelSaver
from mico_tpu.train.train_step import make_train_step, shard_batch
from mico_tpu.utils.logger import LOGGER, RunningMeter


def get_best_name(task: str) -> Optional[str]:
    """Metric that defines 'best' for a task (reference pipeline.py:168-179)."""
    head = task.split("%")[0].split("_")[0]
    return {"cap": "CIDEr", "qa": "accuracy", "ret": "video_r1"}.get(head)


def train(
    cfg: MiCoConfig,
    params,
    opt_state,
    optimizer,
    meta_loader,
    val_loaders: Dict,
    run_cfg,
    tokenizer,
    mesh=None,
    evaluate_every: Optional[int] = None,
    start_step: int = 0,
    model_axis: Optional[str] = "model",
):
    """Run the training loop; returns final (params, opt_state).

    start_step: global step to resume counting from (reference
    build_model.py:106-124 resume contract — the restored checkpoint's step,
    so periodic saves continue the numbering instead of restarting at 0)."""
    num_steps = int(run_cfg.get("num_train_steps", 1000))
    valid_steps = evaluate_every or int(run_cfg.get("valid_steps", num_steps))
    log_every = int(run_cfg.get("log_every", 50))
    saver = ModelSaver(
        run_cfg.get("output_dir", "./output"),
        remove_before_ckpt=bool(run_cfg.get("remove_before_ckpt", True)),
        backend=run_cfg.get("checkpoint_backend", "npz"),
    )
    batch_tok = BatchTokenizer(
        tokenizer,
        max_caption_len=cfg.max_caption_len,
        max_omni_caption_len=cfg.max_omni_caption_len,
        max_subtitle_len=cfg.max_subtitle_len,
    )
    evaluate_fn = evaluation_registry[
        run_cfg.get("evaluation_type", "evaluation_mm")
    ]
    step_fns: Dict[str, callable] = {}
    meters: Dict[str, RunningMeter] = {}
    best_indicator: Dict[str, float] = {}
    rng = jax.random.PRNGKey(int(run_cfg.get("seed", 0)))

    global_step = int(start_step)
    t0 = time.time()
    for name, batch in iter(meta_loader):
        if global_step >= num_steps:
            break
        task = name.split("--")[0]
        is_scst = task.startswith("scst")
        if task not in step_fns:
            if is_scst:
                from mico_tpu.train.scst import make_scst_step

                step_fns[task] = make_scst_step(
                    cfg, optimizer, task, tokenizer,
                    finetune_encoder=bool(
                        run_cfg.get("scst_finetune_encoder", False)
                    ),
                )
            else:
                step_fns[task] = make_train_step(
                    cfg, optimizer, task, mesh=mesh,
                    zero1=bool(run_cfg.get("zero1", False)),
                    model_axis=model_axis,
                )
        tb = batch_tok(batch, task)
        arrays = {
            k: jnp.asarray(v) for k, v in tb.items() if not isinstance(v, list)
        }
        if mesh is not None:
            n_data = mesh.shape.get("data", 1)
            b = next(iter(arrays.values())).shape[0]
            # b is the PER-HOST batch; the global batch (b × processes) must
            # tile the data mesh axis
            if (b * jax.process_count()) % n_data:
                raise ValueError(
                    f"global batch {b}x{jax.process_count()} not divisible by "
                    f"the mesh data axis ({n_data}); raise data_cfg "
                    f"batch_size or shrink the mesh"
                )
            arrays = shard_batch(mesh, arrays)
        rng, sub = jax.random.split(rng)
        if is_scst:
            refs = tb.get("raw_captions") or batch.get("raw_captions")
            step_args = (params, opt_state, arrays, sub, refs)
        else:
            step_args = (params, opt_state, arrays, sub)
        if mesh is not None:
            # ambient mesh for mesh-aware model internals (the PP shard_map)
            with jax.sharding.set_mesh(mesh):
                params, opt_state, losses = step_fns[task](*step_args)
        else:
            params, opt_state, losses = step_fns[task](*step_args)
        global_step += 1

        for k, v in losses.items():
            key = f"{task}/{k}"
            meters.setdefault(key, RunningMeter(key)).__call__(float(v))
        if global_step % log_every == 0:
            msg = " ".join(str(m) for m in meters.values())
            LOGGER.info(
                "step %d/%d (%.1f s): %s",
                global_step, num_steps, time.time() - t0, msg,
            )
        if global_step % valid_steps == 0 or global_step == num_steps:
            evaluator = Evaluator(cfg, params, tokenizer, run_cfg)
            eval_log = evaluate_fn(evaluator, val_loaders, run_cfg, global_step)
            # orbax saves are COLLECTIVE (each process writes its
            # addressable shards); only the host-gathering npz backend is
            # process-0-only
            if saver.backend == "orbax" or jax.process_index() == 0:
                saver.save(global_step, params, opt_state)
            for loader_name, metrics in eval_log.items():
                t = loader_name.split("--")[0]
                best_name = get_best_name(t)
                if best_name and best_name in metrics:
                    if metrics[best_name] > best_indicator.get(loader_name, -1):
                        best_indicator[loader_name] = metrics[best_name]
                        # orbax best-saves are collective (metrics agree on
                        # every process after the eval gather)
                        if (saver.backend == "orbax"
                                or jax.process_index() == 0):
                            saver.save_best(
                                f"{best_name}_{loader_name.split('--')[-1]}",
                                params,
                            )
                    LOGGER.info(
                        "best %s for %s: %.4f",
                        best_name, loader_name, best_indicator[loader_name],
                    )
    # block on in-flight async (orbax) saves before the interpreter starts
    # tearing down executors — otherwise the final checkpoint is lost
    saver.wait()
    return params, opt_state


def test(cfg: MiCoConfig, params, val_loaders, run_cfg, tokenizer):
    evaluator = Evaluator(cfg, params, tokenizer, run_cfg)
    evaluate_fn = evaluation_registry[
        run_cfg.get("evaluation_type", "evaluation_mm")
    ]
    return evaluate_fn(evaluator, val_loaders, run_cfg, 0)
