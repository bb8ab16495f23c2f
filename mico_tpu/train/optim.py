"""Optimizer with reference param-group semantics, on optax.

Mirrors data/utils/build_optimizer.py:11-99:
  - AdamW betas (0.9, 0.98), decoupled weight decay 0.01, grad-norm clip 2.0
    (defaults from data/caption_config/default_run_cfg.json)
  - groups: basic @ learning_rate; vision tower @ clip_lr; `new_params_name`
    matches @ new_lr; each with a no-decay twin for biases / LayerNorms
  - per-step lr = init_lr * schedule_ratio (data/utils/pipeline.py:75-78),
    expressed as optax schedules inside one multi_transform.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence, Tuple

import jax
import optax

from mico_tpu.train.sched import lr_schedule_ratio


@dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-4
    clip_lr: float = 5e-7
    new_lr: float = 1e-5
    new_params_name: Tuple[str, ...] = ()
    # reference model_cfg.frozen_vision / frozen_audio
    # (general_module.py:204-223: requires_grad=False + eval mode); here the
    # frozen subtrees get optax.set_to_zero so their state never moves
    frozen_prefixes: Tuple[str, ...] = ()
    weight_decay: float = 0.01
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-8
    grad_norm: float = 2.0
    scheduler: str = "warmup_linear"
    warmup_ratio: float = 0.1
    num_train_steps: int = 100000


_NO_DECAY_MARKERS = ("bias", "ln_", "norm")


def _is_no_decay(leaf_name: str) -> bool:
    n = leaf_name.lower()
    return (
        "bias" in n
        or n.endswith("_b")
        or n.startswith("ln")
        or "ln_" in n
        or n.startswith("norm")
        or "_ln_" in n
    )


def _path_names(path) -> Tuple[str, ...]:
    return tuple(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def param_group_labels(
    params,
    new_params_name: Sequence[str] = (),
    frozen_prefixes: Sequence[str] = (),
):
    """Pytree of group labels mirroring the reference grouping rules."""

    def label(path, leaf):
        names = _path_names(path)
        joined = ".".join(names)
        leaf_name = names[-1]
        if names and any(names[0] == p for p in frozen_prefixes):
            return "frozen"
        nd = "_nd" if _is_no_decay(leaf_name) else ""
        if any(m in joined for m in new_params_name):
            return "new" + nd
        if names and names[0] == "vision_encoder":
            return "vision" + nd
        return "basic" + nd

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    params,
    cfg: OptimConfig = OptimConfig(),
) -> optax.GradientTransformation:
    def sched(init_lr: float) -> Callable:
        def f(step):
            return init_lr * lr_schedule_ratio(
                step, cfg.num_train_steps, cfg.warmup_ratio, cfg.scheduler
            )

        return f

    def adamw(lr: float, wd: float):
        return optax.adamw(
            learning_rate=sched(lr),
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=wd,
        )

    groups = {
        "basic": adamw(cfg.learning_rate, cfg.weight_decay),
        "basic_nd": adamw(cfg.learning_rate, 0.0),
        "vision": adamw(cfg.clip_lr, cfg.weight_decay),
        "vision_nd": adamw(cfg.clip_lr, 0.0),
        "new": adamw(cfg.new_lr, cfg.weight_decay),
        "new_nd": adamw(cfg.new_lr, 0.0),
        "frozen": optax.set_to_zero(),
    }
    labels = param_group_labels(
        params, cfg.new_params_name, cfg.frozen_prefixes
    )
    # Frozen subtrees must be zeroed BEFORE the global-norm clip: in the
    # reference they have requires_grad=False and contribute nothing to the
    # grad norm (general_module.py:204-223), so leaving them in would
    # systematically downscale the live updates whenever clipping triggers.
    frozen_mask = jax.tree.map(lambda lab: lab == "frozen", labels)
    return optax.chain(
        optax.masked(optax.set_to_zero(), frozen_mask),
        optax.clip_by_global_norm(cfg.grad_norm),
        optax.multi_transform(groups, labels),
    )
