"""MiCo omni-modal model assembly, TPU-native.

Re-design of the reference `MiCo` / `MMGeneralModule` (model/mico.py:61-423):
one shared EVA ViT encodes every "knowledge" modality — video frames,
images (1-frame videos), audio log-mel spectrograms tiled to 3 channels,
depth maps — and a BERT with cross-attention is the language interface used
for contrastive retrieval, ITM and caption generation.

All forward paths are pure functions of (params, cfg, inputs); `MiCoModel`
is a thin convenience wrapper exposing the reference's method names with
jit-compiled bodies.
"""

from __future__ import annotations

import functools
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.config import BertConfig, EvaVitConfig, MiCoConfig
from mico_tpu import convert as _convert
from mico_tpu.models import bert as bert_mod
from mico_tpu.models import eva_vit as vit_mod
from mico_tpu.ops.interpolate import interp_nearest_1d
from mico_tpu.ops.layers import gelu, layer_norm, linear


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_mico(key: jax.Array, cfg: MiCoConfig) -> dict:
    kv, kb, kh = jax.random.split(key, 3)
    vd, md, cd = cfg.vision_dim, cfg.multimodal_dim, cfg.contra_dim
    ks = iter(jax.random.split(kh, 40))
    rnd = lambda shape, s=0.02: s * jax.random.normal(next(ks), shape, jnp.float32)

    def trans_head(in_dim):
        return {
            "kernel": rnd((in_dim, md)), "bias": jnp.zeros((md,)),
            "ln_w": jnp.ones((md,)), "ln_b": jnp.zeros((md,)),
        }

    params = {
        "vision_encoder": _init_vision_tower(kv, cfg),
        "bert": bert_mod.init_bert(kb, cfg.bert_config),
        # bias-free per-modality contra heads (model/mico.py:36-41,386-390)
        "contra_head_t": {"kernel": rnd((md, cd))},
        "contra_head_s": {"kernel": rnd((md, cd))},
        "contra_head_v": {"kernel": rnd((vd, cd))},
        "contra_head_a": {"kernel": rnd((cfg.audio_dim, cd))},
        "contra_head_d": {"kernel": rnd((vd, cd))},
        # fused-modality heads with bias (model/mico.py:391-394)
        "contra_head_va": {
            "kernel": rnd((vd + cfg.audio_dim, cd)), "bias": jnp.zeros((cd,))
        },
        "contra_head_id": {"kernel": rnd((2 * vd, cd)), "bias": jnp.zeros((cd,))},
        "contra_head_vs": {"kernel": rnd((vd + md, cd)), "bias": jnp.zeros((cd,))},
        "contra_head_vas": {
            "kernel": rnd((vd + cfg.audio_dim + md, cd)), "bias": jnp.zeros((cd,))
        },
        "contra_temp": jnp.asarray(0.07, jnp.float32),
        "itm_head": {
            "fc1_w": rnd((md, md)), "fc1_b": jnp.zeros((md,)),
            "ln_w": jnp.ones((md,)), "ln_b": jnp.zeros((md,)),
            "fc2_w": rnd((md, 2)), "fc2_b": jnp.zeros((2,)),
        },
        "vision_frame_embedding": rnd((1, cfg.max_vision_sample_num, md)),
        "audio_frame_embedding": rnd((1, cfg.max_audio_sample_num, md)),
        "depth_frame_embedding": rnd((1, cfg.max_depth_sample_num, md)),
        "hidden_trans_vision": trans_head(vd),
        "hidden_trans_audio": trans_head(cfg.audio_dim),
        "hidden_trans_depth": trans_head(vd),
        "hidden_trans_subtitle": trans_head(md),
        "vision_type_embeddings": rnd((1, 1, md)),
        "audio_type_embeddings": rnd((1, 1, md)),
        "depth_type_embeddings": rnd((1, 1, md)),
        "subtitle_type_embeddings": rnd((1, 1, md)),
    }
    if cfg.audio_encoder_type != "shared":
        params["audio_encoder"] = _init_audio_tower(key, cfg)
    return params


def fold_inference_params(params: dict, cfg: MiCoConfig) -> dict:
    """Inference-time constant folding of the vision tower (EVA ViT only for
    now): LayerNorm affines and LayerScale folded into the adjacent matmul
    weights (eva_vit.fold_inference_params). A pure reparametrization — use
    for jitted inference (bench/serve); training and fp32 parity runs keep
    the canonical layout."""
    t = cfg.vision_encoder_type
    if cfg.eva_override is not None or t.startswith("evaclip"):
        out = dict(params)
        out["vision_encoder"] = vit_mod.fold_inference_params(
            params["vision_encoder"], cfg.eva_config
        )
        return out
    return params


def _init_vision_tower(key, cfg: MiCoConfig):
    t = cfg.vision_encoder_type
    if cfg.eva_override is not None or t.startswith("evaclip"):
        return vit_mod.init_eva_vit(key, cfg.eva_config)
    tower_cfg = cfg.vision_tower_config
    if t.startswith("clip"):
        from mico_tpu.models.clip_vit import init_clip_vit

        return init_clip_vit(key, tower_cfg)
    if t.startswith("videoswin"):
        from mico_tpu.models.swin import init_videoswin

        return init_videoswin(key, tower_cfg)
    if t.startswith("swin"):
        from mico_tpu.models.swin import init_swin

        return init_swin(key, tower_cfg)
    raise NotImplementedError(t)


def _init_audio_tower(key, cfg: MiCoConfig):
    from mico_tpu.models.audio import init_ast, init_beats

    tower_cfg = cfg.audio_tower_config
    if cfg.audio_encoder_type.startswith("beats"):
        return init_beats(key, tower_cfg)
    return init_ast(key, tower_cfg)


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


def forward_vision_encoder(
    params: dict, cfg: MiCoConfig, pixels: jnp.ndarray,
    remat: Optional[bool] = None, train_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(b, n, 3, h, w) → (b, n, seq, vision_dim): frames folded into the batch
    for one big MXU-friendly ViT pass (model/mico.py:115-137).

    train_rng activates the EVA training regularizers (DropPath schedule up
    to cfg drop_path_rate — 0.4 for ViT-g — and PatchDropout if configured)."""
    b, n = pixels.shape[:2]
    flat = pixels.reshape(b * n, *pixels.shape[2:])
    _, compute_dtype = cfg.dtypes()
    t = cfg.vision_encoder_type
    if cfg.eva_override is not None or t.startswith("evaclip"):
        tokens = vit_mod.eva_vit_forward(
            params["vision_encoder"],
            cfg.eva_config,
            flat,
            return_all_features=True,
            compute_dtype=compute_dtype,
            attn_impl="flash" if cfg.use_flash_attention else "xla",
            remat=cfg.checkpointing if remat is None else remat,
            remat_policy=cfg.remat_policy,
            unroll_blocks=cfg.unroll_blocks and train_rng is not None,
            train_rng=train_rng,
            pipeline_stages=cfg.pipeline_stages,
            pipeline_microbatches=cfg.pipeline_microbatches,
        )
    elif t.startswith("clip"):
        from mico_tpu.models.clip_vit import clip_vit_forward

        tokens = clip_vit_forward(
            params["vision_encoder"], cfg.vision_tower_config, flat,
            return_all_features=True, compute_dtype=compute_dtype,
        )
    elif t.startswith("videoswin"):
        # (b, n, 3, h, w) → (b, 3, n, h, w) volume; output tokens per frame
        # (reference general_module.py:391-395)
        from mico_tpu.models.swin import videoswin_forward

        vol = videoswin_forward(
            params["vision_encoder"], cfg.vision_tower_config,
            pixels.transpose(0, 2, 1, 3, 4), compute_dtype=compute_dtype,
            train_rng=train_rng,
        )                                   # (b, C, D, H, W)
        bb, c, d = vol.shape[:3]
        tokens = vol.transpose(0, 2, 3, 4, 1).reshape(bb, d, -1, c)
        return tokens
    elif t.startswith("swin"):
        from mico_tpu.models.swin import swin_forward_features

        tokens = swin_forward_features(
            params["vision_encoder"], cfg.vision_tower_config, flat,
            compute_dtype=compute_dtype, train_rng=train_rng,
        )
    else:
        raise NotImplementedError(t)
    return tokens.reshape(b, n, *tokens.shape[1:])


def forward_audio_encoder(
    params: dict, cfg: MiCoConfig, spectrograms: jnp.ndarray,
    train_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(b, n, T, M) fbank slices → per-slice token sequences (b, n, x, C).

    'shared': tile to 3 channels through the shared ViT (model/mico.py:139-143).
    'beats'/'ast': the VAST separate towers (general_module.py:405-424;
    ast transposes to (M, T) first)."""
    if cfg.audio_encoder_type == "shared":
        x = jnp.repeat(spectrograms[:, :, None, :, :], 3, axis=2)
        return forward_vision_encoder(params, cfg, x, train_rng=train_rng)
    _, compute_dtype = cfg.dtypes()
    b, n = spectrograms.shape[:2]
    flat = spectrograms.reshape(b * n, *spectrograms.shape[2:])
    if cfg.audio_encoder_type.startswith("ast"):
        from mico_tpu.models.audio import ast_forward

        tokens = ast_forward(
            params["audio_encoder"], cfg.audio_tower_config,
            flat.transpose(0, 2, 1), compute_dtype=compute_dtype,
            train_rng=train_rng,
        )
    else:
        from mico_tpu.models.audio import beats_forward

        tokens = beats_forward(
            params["audio_encoder"], cfg.audio_tower_config, flat,
            compute_dtype=compute_dtype, train_rng=train_rng,
        )
    return tokens.reshape(b, n, *tokens.shape[1:])


def forward_depth_encoder(
    params: dict, cfg: MiCoConfig, depth_pixels: jnp.ndarray,
    train_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    return forward_vision_encoder(params, cfg, depth_pixels,
                                  train_rng=train_rng)


def forward_multimodal_encoder(
    params: dict,
    cfg: MiCoConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    condition_feat: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    train_rng: Optional[jnp.ndarray] = None,
    condition_row_index: Optional[jnp.ndarray] = None,
) -> bert_mod.BertOutput:
    _, compute_dtype = cfg.dtypes()
    return bert_mod.bert_forward(
        params["bert"],
        cfg.bert_config,
        input_ids,
        attention_mask,
        encoder_hidden_states=condition_feat,
        encoder_row_index=condition_row_index,
        labels=labels,
        position_ids=position_ids,
        compute_dtype=compute_dtype,
        attn_impl="flash" if cfg.use_flash_attention else "xla",
        remat=(cfg.checkpointing if cfg.bert_checkpointing is None
               else cfg.bert_checkpointing),
        train_rng=train_rng,
    )


# ---------------------------------------------------------------------------
# Pooling & heads
# ---------------------------------------------------------------------------


def pool_frames_for_contra(
    feature: jnp.ndarray, patch_mean: bool = False
) -> jnp.ndarray:
    """(b, n, x, c): CLS token per frame (clip/evaclip rule) or mean over
    patches (swin/videoswin/beats rule), then mean over frames
    (model/mico.py:157-182; general_module.py:426-449)."""
    per_frame = feature.mean(axis=2) if patch_mean else feature[:, :, 0]
    return jnp.mean(per_frame, axis=1)


def pool_vision_for_contra(cfg: MiCoConfig, feature: jnp.ndarray) -> jnp.ndarray:
    t = cfg.vision_encoder_type
    return pool_frames_for_contra(
        feature, patch_mean=t.startswith(("swin", "videoswin"))
    )


def pool_audio_for_contra(cfg: MiCoConfig, feature: jnp.ndarray) -> jnp.ndarray:
    # ast keeps CLS; beats (and the shared ViT route, which has a CLS) —
    # beats has no CLS → patch-mean (general_module.py:441-449)
    return pool_frames_for_contra(
        feature, patch_mean=cfg.audio_encoder_type.startswith("beats")
    )


def pool_depth_for_contra(cfg: MiCoConfig, feature: jnp.ndarray) -> jnp.ndarray:
    return pool_vision_for_contra(cfg, feature)


def pool_text_for_contra(feature: jnp.ndarray) -> jnp.ndarray:
    return feature[:, 0]


def contra_head(params: dict, feature: jnp.ndarray) -> jnp.ndarray:
    return linear(feature, params["kernel"], params.get("bias"))


def itm_head(params: dict, cls_token: jnp.ndarray) -> jnp.ndarray:
    """Match head: Linear → GELU → LN(1e-12) → Linear(2)
    (model/mico.py:44-52)."""
    hp = params["itm_head"]
    x = gelu(linear(cls_token, hp["fc1_w"], hp["fc1_b"]))
    x = layer_norm(x, hp["ln_w"], hp["ln_b"], 1e-12)
    return linear(x, hp["fc2_w"], hp["fc2_b"])


def _frame_embedding(emb: jnp.ndarray, n: int) -> jnp.ndarray:
    """Adaptive frame embedding: nearest-interp over the frame axis when the
    sample count differs from training (model/mico.py:195-204). n is static
    under jit, so this is a trace-time branch."""
    if emb.shape[1] == n:
        return emb
    return interp_nearest_1d(emb.transpose(0, 2, 1), n).transpose(0, 2, 1)


def _condition_input(
    params: dict,
    cfg: MiCoConfig,
    output: jnp.ndarray,
    trans_key: str,
    frame_key: Optional[str],
    type_key: str,
) -> jnp.ndarray:
    b, n, x, c = output.shape
    if cfg.pool_video:
        output = jnp.concatenate(
            [output[:, :, :1], jnp.mean(output[:, :, 1:], axis=2, keepdims=True)],
            axis=2,
        )
    tp = params[trans_key]
    output = linear(output, tp["kernel"], tp["bias"])
    output = layer_norm(output, tp["ln_w"], tp["ln_b"], 1e-12)
    if frame_key is not None and cfg.frame_embedding_type == "adaptive":
        fe = _frame_embedding(params[frame_key], n).astype(output.dtype)
        output = output + fe[:, :, None, :]
    output = output.reshape(b, -1, cfg.multimodal_dim)
    return output + params[type_key].astype(output.dtype)


def get_multimodal_forward_input_vision(params, cfg, vision_output):
    return _condition_input(
        params, cfg, vision_output,
        "hidden_trans_vision", "vision_frame_embedding", "vision_type_embeddings",
    )


def get_multimodal_forward_input_audio(params, cfg, audio_output):
    return _condition_input(
        params, cfg, audio_output,
        "hidden_trans_audio", "audio_frame_embedding", "audio_type_embeddings",
    )


def get_multimodal_forward_input_depth(params, cfg, depth_output):
    return _condition_input(
        params, cfg, depth_output,
        "hidden_trans_depth", "depth_frame_embedding", "depth_type_embeddings",
    )


def get_multimodal_forward_input_subtitle(params, cfg, subtitle_output):
    tp = params["hidden_trans_subtitle"]
    out = linear(subtitle_output, tp["kernel"], tp["bias"])
    out = layer_norm(out, tp["ln_w"], tp["ln_b"], 1e-12)
    return out + params["subtitle_type_embeddings"].astype(out.dtype)


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------


def remap_legacy_keys(sd: Mapping) -> Dict[str, np.ndarray]:
    """Reference key surgery at load time (inference_demo.py:29-40):
    video→vision, evaclip_model/clip_model→vision_encoder."""
    out = {}
    for k, v in _convert.to_numpy(sd).items():
        if "video" in k:
            out[k.replace("video", "vision")] = v
        elif "evaclip_model" in k:
            out[k.replace("evaclip_model", "vision_encoder")] = v
        elif "clip_model" in k:
            out[k.replace("clip_model", "vision_encoder")] = v
        else:
            out[k] = v
    return out


def mico_from_torch(sd: Mapping, cfg: MiCoConfig,
                    consumed: Optional[set] = None) -> dict:
    """Full MiCo checkpoint (flat torch state_dict, possibly legacy-keyed) →
    param pytree, with frame-embedding nearest resize and pos-embed bilinear
    resize exactly as the reference loader (inference_demo.py:42-97).

    consumed: optional set collecting every (post-legacy-remap) key actually
    read — callers diff it against the checkpoint to surface leftovers
    instead of dropping tensors silently."""
    sd = remap_legacy_keys(sd)
    if consumed is not None:
        sd = _convert._TrackedDict(sd, consumed)
    t = _convert._t

    def lin(name, bias=True):
        p = {"kernel": jnp.asarray(t(sd[f"{name}.weight"]))}
        if bias:
            p["bias"] = jnp.asarray(sd[f"{name}.bias"])
        return p

    def trans(name):
        return {
            "kernel": jnp.asarray(t(sd[f"{name}.0.weight"])),
            "bias": jnp.asarray(sd[f"{name}.0.bias"]),
            "ln_w": jnp.asarray(sd[f"{name}.1.weight"]),
            "ln_b": jnp.asarray(sd[f"{name}.1.bias"]),
        }

    def frame_emb(name, target):
        return jnp.asarray(
            _convert.resize_frame_embedding(sd[name], target)
        )

    params = {
        "vision_encoder": _convert.eva_vit_from_torch(
            sd, cfg.eva_config, prefix="vision_encoder.visual.",
            consumed=consumed,
        ),
        "bert": _convert.bert_from_torch(
            sd, cfg.bert_config, prefix="multimodal_encoder.",
            consumed=consumed,
        ),
        "contra_temp": jnp.asarray(sd["contra_temp"], jnp.float32),
        "itm_head": {
            "fc1_w": jnp.asarray(t(sd["itm_head.linear1.weight"])),
            "fc1_b": jnp.asarray(sd["itm_head.linear1.bias"]),
            "ln_w": jnp.asarray(sd["itm_head.layernorm.weight"]),
            "ln_b": jnp.asarray(sd["itm_head.layernorm.bias"]),
            "fc2_w": jnp.asarray(t(sd["itm_head.linear2.weight"])),
            "fc2_b": jnp.asarray(sd["itm_head.linear2.bias"]),
        },
        "vision_frame_embedding": frame_emb(
            "vision_frame_embedding", cfg.max_vision_sample_num
        ),
        "audio_frame_embedding": frame_emb(
            "audio_frame_embedding", cfg.max_audio_sample_num
        ),
        "depth_frame_embedding": frame_emb(
            "depth_frame_embedding", cfg.max_depth_sample_num
        ),
        "hidden_trans_vision": trans("hidden_trans_vision_multimodal"),
        "hidden_trans_audio": trans("hidden_trans_audio_multimodal"),
        "hidden_trans_depth": trans("hidden_trans_depth_multimodal"),
        "hidden_trans_subtitle": trans("hidden_trans_subtitle_multimodal"),
    }
    for m in ("t", "s", "v", "a", "d"):
        params[f"contra_head_{m}"] = lin(f"contra_head_{m}.linear", bias=False)
    for m in ("va", "id", "vs", "vas"):
        params[f"contra_head_{m}"] = lin(f"contra_head_{m}")
    for m in ("vision", "audio", "depth", "subtitle"):
        params[f"{m}_type_embeddings"] = jnp.asarray(sd[f"{m}_type_embeddings"])
    return params


# ---------------------------------------------------------------------------
# Convenience wrapper (reference-shaped API)
# ---------------------------------------------------------------------------


class MiCoModel:
    """Bundles (params, cfg) and exposes the reference method surface
    (model/mico.py) with jit-compiled bodies."""

    def __init__(self, params: dict, cfg: MiCoConfig):
        self.params = params
        self.config = cfg

    # -- constructors ------------------------------------------------------
    @classmethod
    def init(cls, cfg: MiCoConfig, seed: int = 0) -> "MiCoModel":
        return cls(init_mico(jax.random.PRNGKey(seed), cfg), cfg)

    @classmethod
    def from_pretrained(cls, cfg: MiCoConfig, state_dict: Mapping) -> "MiCoModel":
        return cls(mico_from_torch(state_dict, cfg), cfg)

    # -- jitted forwards ---------------------------------------------------
    @functools.cached_property
    def _vision_fn(self):
        return jax.jit(functools.partial(forward_vision_encoder, cfg=self.config))

    def forward_vision_encoder(self, pixels):
        return self._vision_fn(self.params, pixels=pixels)

    @functools.cached_property
    def _audio_fn(self):
        return jax.jit(functools.partial(forward_audio_encoder, cfg=self.config))

    def forward_audio_encoder(self, spectrograms):
        # routes to the shared ViT (3-channel tile) or the separate
        # BEATs/AST tower per cfg.audio_encoder_type
        return self._audio_fn(self.params, spectrograms=spectrograms)

    def forward_depth_encoder(self, depth_pixels):
        return self._vision_fn(self.params, pixels=depth_pixels)

    @functools.cached_property
    def _text_fn(self):
        cfg = self.config

        @jax.jit
        def f(params, input_ids, attention_mask):
            return forward_multimodal_encoder(
                params, cfg, input_ids, attention_mask
            ).sequence_output

        return f

    def forward_multimodal_encoder(
        self, input_ids, attention_mask, condition_feat=None
    ):
        if condition_feat is None:
            return self._text_fn(self.params, input_ids, attention_mask)
        return self._cond_text_fn(self.params, input_ids, attention_mask, condition_feat)

    @functools.cached_property
    def _cond_text_fn(self):
        cfg = self.config

        @jax.jit
        def f(params, input_ids, attention_mask, condition_feat):
            return forward_multimodal_encoder(
                params, cfg, input_ids, attention_mask, condition_feat
            ).sequence_output

        return f

    # -- pooling / heads ---------------------------------------------------
    def pool_vision_for_contra(self, feature):
        return pool_vision_for_contra(self.config, feature)

    def pool_audio_for_contra(self, feature):
        return pool_audio_for_contra(self.config, feature)

    def pool_depth_for_contra(self, feature):
        return pool_depth_for_contra(self.config, feature)

    def pool_text_for_contra(self, feature):
        return pool_text_for_contra(feature)

    def contra_head(self, name, feature):
        return contra_head(self.params[f"contra_head_{name}"], feature)

    def itm_head(self, cls_token):
        return itm_head(self.params, cls_token)

    def get_multimodal_forward_input_vision(self, vision_output):
        return get_multimodal_forward_input_vision(
            self.params, self.config, vision_output
        )

    def get_multimodal_forward_input_audio(self, audio_output):
        return get_multimodal_forward_input_audio(
            self.params, self.config, audio_output
        )

    def get_multimodal_forward_input_depth(self, depth_output):
        return get_multimodal_forward_input_depth(
            self.params, self.config, depth_output
        )
