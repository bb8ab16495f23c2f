"""Training objectives: the VAST task engine, TPU-native.

Re-design of data/model/vast.py:317-650 as pure functions over (params, cfg,
batch) designed to run inside one pjit-ed train step over a `data` mesh axis:

  - ITC (forward_ret, vast.py:394-417): cross-device feature all-gather,
    similarity / temperature, per-shard diagonal targets, label smoothing
    0.1, symmetric CE.
  - ITM (vast.py:419-457): hard-negative sampling from the softmaxed
    similarity (diagonal zeroed), 3×bs batch [pos | cond-neg | text-neg]
    through BERT cross-attn, 2-way CE on CLS. itm_ratio weighting.
  - CAP (vast.py:485-512): 60% token masking, causal-triangular 3D mask,
    MLM loss through cross-attention.
  - QA  (vast.py:557-611): question prefix bidirectional / answer causal
    "part-causal" mask, 99% answer masking.

Condition features (`condition_feats_{v,a,s,va,vs,vas}`) and pooled
contrastive features (`feat_*`) follow vast.py:81-314 `batch_get`, including
the fused-modality concat heads.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mico_tpu.config import MiCoConfig
from mico_tpu.models import bert as bert_mod
from mico_tpu.models import mico as mico_mod
from mico_tpu.parallel.collectives import (
    all_gather_concat,
    all_gather_no_grad,
    data_axis_index,
)
from mico_tpu.train.masker import mask_tokens


def _normalize(x):
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Feature extraction (batch_get equivalent)
# ---------------------------------------------------------------------------


def compute_features(
    params: dict,
    cfg: MiCoConfig,
    batch: Dict[str, jnp.ndarray],
    modalities: str,
    train_rng: Optional[jax.Array] = None,
    cache: Optional[dict] = None,
) -> Dict[str, jnp.ndarray]:
    """Compute encoder outputs, pooled contra features, and condition feats
    for the given fused-modality string ('v', 'a', 'va', 'vs', 'vas', ...).

    batch keys (all device arrays):
      vision_pixels (b,n,3,h,w), audio_spectrograms (b,n,T,M),
      caption_ids/caption_mask (b,L), subtitle_ids/subtitle_mask (b,L)

    train_rng (training only) activates the encoders' stochastic
    regularizers: EVA DropPath/PatchDropout and BERT dropout 0.1.

    cache: a per-step dict memoizing tower outputs across fused-modality
    groups and subtasks — the reference's `batch_get` semantics
    (vast.py:81-314): each encoder runs ONCE per train step (one dropout
    pattern, shared activations), however many subtasks consume it. Callers
    iterating subtasks must pass the SAME cache and train_rng to every call.
    """
    out: Dict[str, jnp.ndarray] = {}
    pooled = {}
    ks = {}
    if cache is None:
        cache = {}
    if train_rng is not None:
        keys = jax.random.split(train_rng, 4)
        ks = dict(zip("vads", keys))

    if "v" in modalities or "i" in modalities:
        if "vision" not in cache:
            vis = mico_mod.forward_vision_encoder(
                params, cfg, batch["vision_pixels"], train_rng=ks.get("v")
            )
            cache["vision"] = (
                mico_mod.pool_vision_for_contra(cfg, vis),
                mico_mod.get_multimodal_forward_input_vision(params, cfg, vis),
            )
        feat, cond = cache["vision"]
        # 'i' is MiCo's image alias for the fused image+depth ('id') head
        for m in ("v", "i"):
            if m in modalities:
                pooled[m] = feat
                out[f"condition_feats_{m}"] = cond
    if "a" in modalities:
        if "audio" not in cache:
            aud = mico_mod.forward_audio_encoder(
                params, cfg, batch["audio_spectrograms"], train_rng=ks.get("a")
            )
            cache["audio"] = (
                mico_mod.pool_audio_for_contra(cfg, aud),
                mico_mod.get_multimodal_forward_input_audio(params, cfg, aud),
            )
        pooled["a"], out["condition_feats_a"] = cache["audio"]
    if "d" in modalities:
        # depth maps as 3-channel pixels through the shared encoder
        # (model/mico.py:145-148; MiCo's I+V+A+D omni-modal recipe — VAST
        # itself has no depth branch, the 'id' fused head is MiCo's)
        if "depth" not in cache:
            dep = mico_mod.forward_depth_encoder(
                params, cfg, batch["depth_pixels"], train_rng=ks.get("d")
            )
            cache["depth"] = (
                mico_mod.pool_depth_for_contra(cfg, dep),
                mico_mod.get_multimodal_forward_input_depth(params, cfg, dep),
            )
        pooled["d"], out["condition_feats_d"] = cache["depth"]
    if "s" in modalities:
        if "subtitle" not in cache:
            sub = mico_mod.forward_multimodal_encoder(
                params, cfg, batch["subtitle_ids"], batch["subtitle_mask"],
                train_rng=ks.get("s"),
            ).sequence_output
            cache["subtitle"] = (
                mico_mod.pool_text_for_contra(sub),
                mico_mod.get_multimodal_forward_input_subtitle(
                    params, cfg, sub
                ),
            )
        pooled["s"], out["condition_feats_s"] = cache["subtitle"]

    # fused condition feats: token-wise concat (vast.py:102-119)
    if f"condition_feats_{modalities}" not in out:
        parts = [out[f"condition_feats_{m}"] for m in modalities]
        out[f"condition_feats_{modalities}"] = jnp.concatenate(parts, axis=1)

    if cfg.shard_condition_sequence:
        # sequence parallelism over the cross-attention context: the
        # condition token axis (n_frames·257 and growing with fused
        # modalities — MiCo's only long axis, SURVEY §5.7) is sharded over
        # the model mesh axis; GSPMD places the cross-attention collectives
        from jax.sharding import PartitionSpec as P

        for k in list(out):
            if k.startswith("condition_feats_"):
                out[k] = jax.lax.with_sharding_constraint(
                    out[k], P("data", "model", None)
                )

    # pooled contra feature through the matching head (vast.py:122-279)
    if len(modalities) == 1:
        feat = mico_mod.contra_head(
            params[f"contra_head_{modalities}"], pooled[modalities]
        )
    else:
        cat = jnp.concatenate([pooled[m] for m in modalities], axis=-1)
        feat = mico_mod.contra_head(params[f"contra_head_{modalities}"], cat)
    out[f"feat_{modalities}"] = _normalize(feat)
    return out


def compute_text_feature(params, cfg, batch, ids_key="caption_ids",
                         mask_key="caption_mask", train_rng=None):
    seq = mico_mod.forward_multimodal_encoder(
        params, cfg, batch[ids_key], batch[mask_key], train_rng=train_rng
    ).sequence_output
    feat = mico_mod.contra_head(
        params["contra_head_t"], mico_mod.pool_text_for_contra(seq)
    )
    return _normalize(feat)


def caption_stream_for(batch: Dict, mods: str):
    """Per-subtask caption stream selection.

    VAST-27M batches carry three caption sources; 'tv' trains against the
    vision caption, 'ta' against the audio caption, fused groups against the
    omni caption (reference forward_{cap,ret}_vast27m, vast.py:655-780).
    Other datasets have a single `caption_ids` stream."""
    if any(f"{s}_caption_ids" in batch for s in ("vision", "audio", "omni")):
        src = {"v": "vision", "a": "audio"}.get(mods, "omni")
        key = f"{src}_caption_ids"
        if key in batch:
            return batch[key], batch[f"{src}_caption_mask"]
    return batch["caption_ids"], batch["caption_mask"]


# ---------------------------------------------------------------------------
# ITC
# ---------------------------------------------------------------------------


def _smoothed_ce(logits, targets, smoothing=0.1):
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    one_hot = jax.nn.one_hot(targets, n)
    soft = one_hot * (1 - smoothing) + smoothing / n
    return -jnp.mean(jnp.sum(soft * logp, axis=-1))


def itc_loss(
    feat_cond: jnp.ndarray,
    feat_t: jnp.ndarray,
    temp: jnp.ndarray,
    axis_name: Optional[str],
    label_smoothing: float = 0.1,
):
    """Symmetric InfoNCE with cross-device gathered negatives
    (vast.py:394-417). Returns (loss, sim_t2cond, sim_cond2t) — the sims are
    reused by ITM hard-negative mining."""
    feat_t_all = all_gather_no_grad(feat_t, axis_name)
    feat_cond_all = all_gather_no_grad(feat_cond, axis_name)
    sim_cond2t = (feat_cond @ feat_t_all.T) / temp
    sim_t2cond = (feat_t @ feat_cond_all.T) / temp
    bs = feat_t.shape[0]
    rank = data_axis_index(axis_name)
    targets = rank * bs + jnp.arange(bs)
    loss = 0.5 * (
        _smoothed_ce(sim_cond2t, targets, label_smoothing)
        + _smoothed_ce(sim_t2cond, targets, label_smoothing)
    )
    return loss, sim_t2cond, sim_cond2t


# ---------------------------------------------------------------------------
# ITM
# ---------------------------------------------------------------------------

# Project the ITM pass's per-layer cross-K/V once per UNIQUE condition row
# and gather per query row (vs the reference's 3×bs duplicated projections).
# Exact same math — but measured NEGATIVE on v5e at the production mix
# (round 4 A/B, BASELINE.md: 3183 vs 3076 ms/step): the per-layer gather
# materializes the same K/V bytes the projection would have written, and
# its backward is a scatter-add — together they cost more than the ~3.5%
# of mix FLOPs the dedup saves. Kept opt-in + equivalence-tested.
ITM_DEDUP_CROSS_KV = False


def itm_loss(
    rng: jax.Array,
    params: dict,
    cfg: MiCoConfig,
    condition_feats: jnp.ndarray,     # (b, Lc, H)
    input_ids: jnp.ndarray,           # (b, L)
    attention_mask: jnp.ndarray,
    sim_t2cond: jnp.ndarray,          # (b, world*b)
    sim_cond2t: jnp.ndarray,
    axis_name: Optional[str],
    dedup_cross_kv: Optional[bool] = None,
):
    """Hard-negative ITM (vast.py:419-457).

    dedup_cross_kv (default ITM_DEDUP_CROSS_KV=False — measured negative
    on-chip, see module constant above): the 3×bs pass's row
    groups [pos, pos-text×neg-cond, neg-text×pos-cond] reference only b
    (single-device) / 2b (cross-device negatives) UNIQUE conditions, so the
    per-layer cross-K/V projections run once per unique row and are
    gathered per query row (models/bert.py kv_index) — identical math
    (project-after-gather == gather-after-project, row-independent matmul).
    Savings: ~2/3 fewer cross-K/V projection FLOPs in the b-unique
    single-device layout (axis_name=None, 3b→b), ~1/3 fewer in the
    cross-device-negatives layout (3b→2b). The reference projects all 3×bs
    duplicated rows (vast.py:437-447)."""
    bs = input_ids.shape[0]
    rank = data_axis_index(axis_name)

    cond_all = all_gather_concat(condition_feats, axis_name)
    ids_all = all_gather_no_grad(input_ids, axis_name)
    mask_all = all_gather_no_grad(attention_mask, axis_name)

    def neg_weights(sim):
        w = jax.nn.softmax(sim.astype(jnp.float32), axis=1) + 1e-4
        cols = jnp.arange(sim.shape[1])[None, :]
        diag = cols == (rank * bs + jnp.arange(bs)[:, None])
        return jnp.where(diag, 0.0, w)

    k1, k2, k_drop = jax.random.split(rng, 3)
    neg_cond_idx = jax.random.categorical(
        k1, jnp.log(neg_weights(sim_t2cond)), axis=1
    )
    neg_text_idx = jax.random.categorical(
        k2, jnp.log(neg_weights(sim_cond2t)), axis=1
    )

    cond_neg = jnp.take(cond_all, neg_cond_idx, axis=0)
    ids_neg = jnp.take(ids_all, neg_text_idx, axis=0)
    mask_neg = jnp.take(mask_all, neg_text_idx, axis=0)

    ids_3 = jnp.concatenate([input_ids, input_ids, ids_neg], axis=0)
    mask_3 = jnp.concatenate([attention_mask, attention_mask, mask_neg], axis=0)

    if dedup_cross_kv is None:
        dedup_cross_kv = ITM_DEDUP_CROSS_KV
    pos_idx = jnp.arange(bs, dtype=jnp.int32)
    if not dedup_cross_kv:
        cond_u = jnp.concatenate(
            [condition_feats, cond_neg, condition_feats], axis=0
        )
        row_idx = None
    elif axis_name is None:
        # negatives are drawn from the local rows: b unique conditions
        cond_u = condition_feats
        row_idx = jnp.concatenate(
            [pos_idx, neg_cond_idx.astype(jnp.int32), pos_idx]
        )
    else:
        # negatives may live on other devices: positives deduped, 2b unique
        cond_u = jnp.concatenate([condition_feats, cond_neg], axis=0)
        row_idx = jnp.concatenate([pos_idx, bs + pos_idx, pos_idx])

    seq = mico_mod.forward_multimodal_encoder(
        params, cfg, ids_3, mask_3, cond_u, train_rng=k_drop,
        condition_row_index=row_idx,
    ).sequence_output
    logits = mico_mod.itm_head(params, seq[:, 0])
    labels = jnp.concatenate(
        [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)]
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    return loss


def compute_slice_scores(
    params: dict,
    cfg: MiCoConfig,
    condition_feats: jnp.ndarray,     # (b, Lc, H) per-slice condition feats
    input_ids: jnp.ndarray,           # (b, L)
    attention_mask: jnp.ndarray,
) -> jnp.ndarray:
    """ITM match probability per (text, condition-slice) pair — the
    reference's slice-ranking helper for long-video retrieval
    (vast.py:373-380): BERT cross-attn CLS → itm_head → softmax[:, 1]."""
    seq = mico_mod.forward_multimodal_encoder(
        params, cfg, input_ids, attention_mask, condition_feats
    ).sequence_output
    logits = mico_mod.itm_head(params, seq[:, 0])
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]


# ---------------------------------------------------------------------------
# Captioning / QA masks
# ---------------------------------------------------------------------------


def causal_3d_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """(b, L) pad mask → (b, L, L) causal mask (vast.py:491-494)."""
    l = attention_mask.shape[1]
    m = jnp.broadcast_to(
        attention_mask[:, None, :], (attention_mask.shape[0], l, l)
    )
    return jnp.tril(m)


def part_causal_3d_mask(
    question_mask: jnp.ndarray, answer_mask: jnp.ndarray
) -> jnp.ndarray:
    """Question prefix bidirectional, answer causal, question rows blind to
    answers (vast.py:591-596)."""
    b = question_mask.shape[0]
    ql = question_mask.shape[1]
    full = jnp.concatenate([question_mask, answer_mask], axis=1)
    l = full.shape[1]
    m = jnp.broadcast_to(full[:, None, :], (b, l, l)).astype(jnp.int32)
    tril = jnp.tril(jnp.ones((l, l), jnp.int32))
    ans = jnp.ones((l, l), jnp.int32)
    ans = ans.at[ql:, ql:].set(tril[ql:, ql:])   # answer block causal
    ans = ans.at[:ql, ql:].set(0)                # questions can't see answers
    return m * ans[None]


def caption_loss(
    rng: jax.Array,
    params: dict,
    cfg: MiCoConfig,
    condition_feats: jnp.ndarray,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    mask_prob: float = 0.6,
):
    k_mask, k_drop = jax.random.split(rng)
    masked_ids, labels = mask_tokens(
        k_mask, input_ids, mask_prob,
        range_end=cfg.bert_config.vocab_size,
    )
    mask3d = causal_3d_mask(attention_mask)
    out = mico_mod.forward_multimodal_encoder(
        params, cfg, masked_ids, mask3d, condition_feats, labels=labels,
        train_rng=k_drop,
    )
    return out.loss


def qa_loss(
    rng: jax.Array,
    params: dict,
    cfg: MiCoConfig,
    condition_feats: jnp.ndarray,
    question_ids: jnp.ndarray,
    question_mask: jnp.ndarray,
    answer_ids: jnp.ndarray,
    answer_mask: jnp.ndarray,
    mask_prob: float = 0.99,
):
    k_mask, k_drop = jax.random.split(rng)
    masked_ans, ans_labels = mask_tokens(
        k_mask, answer_ids, mask_prob,
        range_end=cfg.bert_config.vocab_size,
    )
    ids = jnp.concatenate([question_ids, masked_ans], axis=1)
    labels = jnp.concatenate(
        [jnp.full_like(question_ids, -100), ans_labels], axis=1
    )
    mask3d = part_causal_3d_mask(question_mask, answer_mask)
    out = mico_mod.forward_multimodal_encoder(
        params, cfg, ids, mask3d, condition_feats, labels=labels,
        train_rng=k_drop,
    )
    return out.loss


# ---------------------------------------------------------------------------
# Task dispatch (VAST.forward equivalent)
# ---------------------------------------------------------------------------


def task_losses(
    rng: jax.Array,
    params: dict,
    cfg: MiCoConfig,
    batch: Dict[str, jnp.ndarray],
    task: str,
    axis_name: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """task: reference grammar, e.g. 'ret%tva' / 'cap%tv%tva' / 'qa%tva'
    (vast.py:317-371). Returns the loss dict.

    Encoder towers run ONCE per step however many subtasks/groups consume
    them — the reference's memoized `batch_get` (vast.py:81-314): one
    feature cache + one feature rng shared across every compute_features
    call (one dropout pattern per tower per step, shared activations)."""
    losses: Dict[str, jnp.ndarray] = {}
    rng, k_feat = jax.random.split(rng)
    feat_cache: dict = {}
    for sub in task.split("_"):
        parts = sub.split("%")
        kind, groups = parts[0], parts[1:]
        feats = {}
        for g in groups:
            mods = g[1:]  # strip leading 't'
            feats.update(
                compute_features(params, cfg, batch, mods,
                                 train_rng=k_feat, cache=feat_cache)
            )

        if kind == "ret":
            itc, itm = [], []
            feat_t_cache = {}
            for g in groups:
                mods = g[1:]
                cap_ids, cap_mask = caption_stream_for(batch, mods)
                ck = id(cap_ids)
                if ck not in feat_t_cache:
                    rng, kt = jax.random.split(rng)
                    feat_t_cache[ck] = compute_text_feature(
                        params, cfg, {"ids": cap_ids, "mask": cap_mask},
                        ids_key="ids", mask_key="mask", train_rng=kt,
                    )
                feat_t = feat_t_cache[ck]
                rng, k = jax.random.split(rng)
                li, s_t2c, s_c2t = itc_loss(
                    feats[f"feat_{mods}"], feat_t, params["contra_temp"],
                    axis_name,
                )
                itc.append(li)
                itm.append(
                    cfg.itm_ratio
                    * itm_loss(
                        k, params, cfg, feats[f"condition_feats_{mods}"],
                        cap_ids, cap_mask, s_t2c, s_c2t, axis_name,
                    )
                )
            losses["loss_itc"] = sum(itc) / len(itc)
            losses["loss_itm"] = sum(itm) / len(itm)
        elif kind == "cap":
            caps = []
            for g in groups:
                mods = g[1:]
                cap_ids, cap_mask = caption_stream_for(batch, mods)
                rng, k = jax.random.split(rng)
                caps.append(
                    caption_loss(
                        k, params, cfg, feats[f"condition_feats_{mods}"],
                        cap_ids, cap_mask,
                    )
                )
            losses["loss_cap"] = sum(caps) / len(caps)
        elif kind == "qa":
            qas = []
            for g in groups:
                mods = g[1:]
                rng, k = jax.random.split(rng)
                qas.append(
                    qa_loss(
                        k, params, cfg, feats[f"condition_feats_{mods}"],
                        batch["question_ids"], batch["question_mask"],
                        batch["answer_ids"], batch["answer_mask"],
                    )
                )
            losses["loss_qa"] = sum(qas) / len(qas)
        else:
            raise ValueError(f"unknown task {kind}")
    return losses
