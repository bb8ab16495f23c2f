"""SCST — self-critical sequence training as a runnable task.

Reference surface: the `--scst_finetuning` flag (data/utils/args.py:255)
over the grad-enabled SCST decoders (model/bert.py:1231 `sample_scst`, :1505
`generate_scst`). The trimmed reference ships the decoders but never wires
the objective; this module completes the loop TPU-natively:

  1. rollout (jit): condition features + a KV-cached multinomial sample and
     the greedy baseline decode, one compiled program;
  2. reward (host): detokenize, per-sample CIDEr-D against the batch's
     reference captions (evaluation.metrics.cider_d_scores), advantage =
     r(sample) − r(greedy) — the self-critical baseline;
  3. update (jit): REINFORCE step. The sampler re-runs under the SAME rng so
     the sampled trajectory is identical and d log P(sample)/dθ flows through
     the decoder, the condition projections, and the shared encoder.

Task grammar matches the reference ('scst%tv', 'scst%tva', ...).

Both rollout and update run the encoders in eval mode (no dropout): the
trajectory re-run in step 3 must reproduce step 1's tokens exactly, which
deterministic forward passes guarantee.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mico_tpu.config import MiCoConfig
from mico_tpu.evaluation.metrics import cider_d_scores
from mico_tpu.generation import cached_generate, generate_scst
from mico_tpu.train.objectives import compute_features


def _groups(task: str) -> List[str]:
    parts = task.split("%")
    if parts[0] != "scst" or len(parts) < 2:
        raise ValueError(f"not an scst task: {task}")
    return [g[1:] for g in parts[1:]]      # 'tv' → 'v', 'tva' → 'va'


def make_scst_step(
    cfg: MiCoConfig,
    optimizer: optax.GradientTransformation,
    task: str,
    tokenizer,
    max_new_tokens: int | None = None,
    donate: bool = True,
    finetune_encoder: bool = False,
):
    """Returns step(params, opt_state, batch_arrays, rng, raw_captions) →
    (params, opt_state, loss_dict). `raw_captions` is the batch's list of
    reference caption strings (or lists of strings).

    finetune_encoder: False (default) reuses the rollout's condition
    features in the update pass — the encoder towers run ONCE per step and
    receive no gradient (decoder-only SCST, the reference's grad-enabled
    surface is the BERT decoders, model/bert.py:1231,1505). True recomputes
    the towers under grad in the update so d loss/d encoder flows (pays a
    second encoder forward + its backward)."""
    mods_list = _groups(task)
    max_new = int(max_new_tokens or cfg.max_caption_len)
    bert_cfg = cfg.bert_config
    dtype = jnp.dtype(cfg.compute_dtype)

    @jax.jit
    def rollout(params, batch, rng):
        out = {}
        conds = {}
        for i, mods in enumerate(mods_list):
            cond = compute_features(params, cfg, batch, mods)[
                f"condition_feats_{mods}"
            ]
            conds[mods] = cond
            sample, _ = generate_scst(
                params["bert"], bert_cfg, cond, max_new_tokens=max_new,
                rng=jax.random.fold_in(rng, i), use_cache=True,
                compute_dtype=dtype,
            )
            greedy = cached_generate(
                params["bert"], bert_cfg, cond, max_new_tokens=max_new,
                mode="greedy", compute_dtype=dtype,
            )
            out[mods] = (sample, greedy)
        return out, conds

    def update(params, opt_state, batch, rng, advantages, conds):
        def loss_fn(p):
            total = jnp.float32(0.0)
            for i, mods in enumerate(mods_list):
                if finetune_encoder:
                    cond = compute_features(p, cfg, batch, mods)[
                        f"condition_feats_{mods}"
                    ]
                else:
                    # rollout's features re-enter as constants: no second
                    # encoder forward, no encoder gradient
                    cond = conds[mods]
                _, logp = generate_scst(
                    p["bert"], bert_cfg, cond, max_new_tokens=max_new,
                    rng=jax.random.fold_in(rng, i), use_cache=True,
                    compute_dtype=dtype,
                )
                seq_logp = jnp.sum(logp, axis=-1)          # (b,)
                total = total - jnp.mean(advantages[mods] * seq_logp)
            return total / len(mods_list), {}

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    update = jax.jit(update, donate_argnums=(0, 1) if donate else ())

    def step(params, opt_state, batch, rng, raw_captions: Sequence):
        refs = [c if isinstance(c, list) else [c] for c in raw_captions]
        rolled, conds = rollout(params, batch, rng)
        advantages: Dict[str, jnp.ndarray] = {}
        reward_sample = reward_greedy = 0.0
        for mods, (sample, greedy) in rolled.items():
            hyp_s = tokenizer.batch_decode(np.asarray(sample))
            hyp_g = tokenizer.batch_decode(np.asarray(greedy))
            r_s = cider_d_scores(hyp_s, refs)
            r_g = cider_d_scores(hyp_g, refs)
            advantages[mods] = jnp.asarray(r_s - r_g, jnp.float32)
            reward_sample += float(np.mean(r_s)) / len(mods_list)
            reward_greedy += float(np.mean(r_g)) / len(mods_list)
        params, opt_state, loss = update(
            params, opt_state, batch, rng, advantages, conds
        )
        losses = {
            "loss_scst": loss,
            "reward_sample": jnp.float32(reward_sample),
            "reward_greedy": jnp.float32(reward_greedy),
        }
        return params, opt_state, losses

    return step
