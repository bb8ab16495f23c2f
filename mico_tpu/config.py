"""Model / run configuration dataclasses and the EVA-CLIP config registry.

Mirrors the capability surface of the reference configuration system:
  - EVA-CLIP vision configs (reference: model/evaclip/model_configs/*.json,
    consumed by model/evaclip/model.py:36-81 `CLIPVisionCfg` and
    model/evaclip/factory.py:211-360 `create_model`)
  - BERT interface config (reference: model/bert-base-uncased-crossattn/config.json)
  - MiCo top-level model config (reference: model/mico.py:374-412, keys read
    from `log/hps.json` `model_cfg` at inference time, inference_demo.py:17-18)

All configs here are plain dataclasses — the layered JSON/CLI merge lives in
mico_tpu/utils/config_io.py.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Vision encoder (EVA ViT family)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EvaVitConfig:
    """EVA Vision Transformer hyperparameters.

    Defaults follow the reference `CLIPVisionCfg` defaults
    (model/evaclip/model.py:36-63) so registry entries only state overrides.
    """

    image_size: int = 224
    patch_size: int = 16
    layers: int = 12
    width: int = 768
    head_width: int = 64
    mlp_ratio: float = 4.0
    embed_dim: int = 512           # CLIP projection dim (head output)
    qkv_bias: bool = True
    ls_init_value: Optional[float] = None   # LayerScale init (None = off)
    drop_path_rate: float = 0.0
    patch_dropout: float = 0.0
    global_average_pool: bool = False       # False => final LN over tokens
    postnorm: bool = False
    rope: bool = False
    pt_hw_seq_len: int = 16
    intp_freq: bool = False
    naiveswiglu: bool = False
    subln: bool = False
    ln_eps: float = 1e-6
    # BEiT-style relative position bias (eva_vit_model.py:451-485,514-517):
    # shared = one table for all blocks; per-block = a table per layer
    use_shared_rel_pos_bias: bool = False
    use_rel_pos_bias: bool = False

    @property
    def num_heads(self) -> int:
        return self.width // self.head_width

    @property
    def head_dim(self) -> int:
        return self.head_width

    @property
    def mlp_hidden(self) -> int:
        # Reference truncates: mlp_hidden_dim = int(dim * mlp_ratio)
        # (model/evaclip/eva_vit_model.py:383)
        return int(self.width * self.mlp_ratio)

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS

    def with_image_size(self, image_size: int) -> "EvaVitConfig":
        return dataclasses.replace(self, image_size=image_size)


# Registry mirroring model/evaclip/model_configs/*.json (vision towers only;
# the CLIP text towers are deleted by MiCo after load, model/mico.py:419).
EVA_VIT_CONFIGS = {
    "EVA01-CLIP-B-16": EvaVitConfig(
        patch_size=16, layers=12, width=768, head_width=64, embed_dim=512,
        ls_init_value=0.1,
    ),
    "EVA01-CLIP-g-14": EvaVitConfig(
        patch_size=14, layers=40, width=1408, head_width=88,
        mlp_ratio=4.3637, embed_dim=1024, drop_path_rate=0.4,
    ),
    "EVA01-CLIP-g-14-plus": EvaVitConfig(
        patch_size=14, layers=40, width=1408, head_width=88,
        mlp_ratio=4.3637, embed_dim=1024,
    ),
    "EVA02-CLIP-B-16": EvaVitConfig(
        patch_size=16, layers=12, width=768, head_width=64,
        mlp_ratio=2.6667, embed_dim=512, rope=True, intp_freq=True,
        naiveswiglu=True, subln=True,
    ),
    "EVA02-CLIP-L-14": EvaVitConfig(
        patch_size=14, layers=24, width=1024, head_width=64,
        mlp_ratio=2.6667, embed_dim=768, rope=True, intp_freq=True,
        naiveswiglu=True, subln=True,
    ),
    "EVA02-CLIP-L-14-336": EvaVitConfig(
        image_size=336, patch_size=14, layers=24, width=1024, head_width=64,
        mlp_ratio=2.6667, embed_dim=768, rope=True, intp_freq=True,
        naiveswiglu=True, subln=True,
    ),
    "EVA02-CLIP-bigE-14": EvaVitConfig(
        patch_size=14, layers=64, width=1792, head_width=112,
        mlp_ratio=8.571428571428571, embed_dim=1024, postnorm=True,
    ),
    "EVA02-CLIP-bigE-14-plus": EvaVitConfig(
        patch_size=14, layers=64, width=1792, head_width=112,
        mlp_ratio=8.571428571428571, embed_dim=1024, postnorm=True,
    ),
}

# vision_encoder_type string → (EVA config name, vision_dim)
# (reference: model/mico.py:323-352 load_clip_model)
VISION_ENCODER_TYPES = {
    "evaclip02_base": ("EVA02-CLIP-B-16", 768),
    "evaclip02_base_self": ("EVA02-CLIP-B-16", 768),
    "evaclip02_large": ("EVA02-CLIP-L-14", 1024),
    "evaclip02_bige": ("EVA02-CLIP-bigE-14-plus", 1792),
    "evaclip01_giant": ("EVA01-CLIP-g-14", 1408),
}

# non-EVA vision towers (reference: data/model/general_module.py:360-375
# openai clip jit archives; model/mico.py swin path; videoswin for VAST)
ALT_VISION_DIMS = {
    "clip_vit_base_16": 768,
    "clip_vit_base_32": 768,
    "clip_vit_large_14_336px": 1024,
    "swin_base_patch4_window7_224_22k": 1024,   # 128 * 2**3
    "videoswin_base": 1024,
}

# audio_encoder_type → encoder output dim; 'shared' = MiCo's audio→vision-ViT
# routing (model/mico.py:92-96), others are VAST's separate towers
# (data/model/general_module.py:245-314)
AUDIO_ENCODER_DIMS = {"shared": None, "beats": 768, "ast": 768}


def eva_config_for_encoder_type(
    vision_encoder_type: str, image_size: Optional[int] = None
) -> EvaVitConfig:
    name, _ = VISION_ENCODER_TYPES[vision_encoder_type]
    cfg = EVA_VIT_CONFIGS[name]
    if image_size is not None:
        cfg = cfg.with_image_size(image_size)
    return cfg


# ---------------------------------------------------------------------------
# BERT interface branch
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BertConfig:
    """BERT-base with cross-attention (reference:
    model/bert-base-uncased-crossattn/config.json)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    pad_token_id: int = 0
    add_cross_attention: bool = True
    # Cross-attention K/V input width (vision tokens are projected to 768
    # before entering BERT, so this equals hidden_size for MiCo).
    encoder_width: int = 768

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


# Special token ids of the bert-base-uncased WordPiece vocab, bound as
# bos/eos/pad/mask at runtime (reference: model/mico.py:109-113).
BERT_CLS_ID = 101   # [CLS] -> bos
BERT_SEP_ID = 102   # [SEP] -> eos
BERT_PAD_ID = 0     # [PAD]
BERT_MASK_ID = 103  # [MASK]


# ---------------------------------------------------------------------------
# MiCo top-level model config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MiCoConfig:
    """Top-level omni-modal model config.

    Field names intentionally match the reference `model_cfg` keys persisted
    in `log/hps.json` (reference: data/utils/args.py:182-184, consumed by
    inference_demo.py:17-18 and model/mico.py:376-412) so checkpoints'
    configs load directly.
    """

    vision_encoder_type: str = "evaclip01_giant"
    vision_resolution: int = 224
    contra_dim: int = 512
    frame_embedding_type: str = "adaptive"   # 'adaptive' | 'none'
    max_vision_sample_num: int = 4
    max_audio_sample_num: int = 4
    max_depth_sample_num: int = 4
    pool_video: bool = False        # 2-token/frame pooling for cross-attn input
    beam_size: int = 3
    itm_ratio: float = 1.0
    max_caption_len: int = 40
    max_omni_caption_len: int = 70
    max_subtitle_len: int = 70
    checkpointing: bool = False     # rematerialize encoder blocks
    # BERT-branch remat override: None follows `checkpointing`; False keeps
    # the interface branch remat-free (it carries ~6% of the step FLOPs but
    # remat re-runs its forward — its activations are small enough to save)
    bert_checkpointing: Optional[bool] = None
    # named jax.checkpoint_policies entry for selective remat (None = full
    # per-block remat). 'dots_with_no_batch_dims_saveable' keeps matmul
    # outputs and recomputes only elementwise ops — ~25% less recompute at
    # ~4 MB/frame/layer of extra activation memory.
    remat_policy: Optional[str] = None
    # Python-unroll the ViT layer march for training instead of
    # scan-over-stacked-params: the scan backward's dynamic-update-slice
    # grad accumulation into stacked (layers, ...) buffers is not aliased
    # in place by XLA (measured copies — BASELINE round 3). Costs a much
    # longer compile; inference always scans.
    unroll_blocks: bool = False
    # GPipe pipeline parallelism for the shared ViT stack over the `model`
    # mesh axis (run_cfg.pipeline_stages; beyond-reference headroom). >1
    # requires an ambient mesh whose `model` axis equals this value.
    # microbatches default to 2x stages (GPipe bubble = (S-1)/(S+M-1);
    # M=2S keeps it under ~1/3 — the resolver logs the actual fraction).
    pipeline_stages: int = 1
    pipeline_microbatches: Optional[int] = None
    # retrieval eval: ITM-rerank the top-N ITC candidates per query, both
    # directions when ret_bidirection_evaluation
    # (reference default_model_cfg.json itm_rerank_num/ret_bidirection)
    itm_rerank_num: int = 50
    ret_bidirection_evaluation: bool = False
    # VAST-style separate audio tower: 'shared' | 'beats' | 'ast'
    # (reference model_cfg.audio_encoder_type, general_module.py:245-314)
    audio_encoder_type: str = "shared"
    audio_melbins: int = 64
    audio_target_length: int = 1024
    # --- TPU-native knobs (no reference equivalent) ---
    compute_dtype: str = "bfloat16"   # activations dtype on TPU
    # sequence parallelism: shard the cross-attention condition-token axis
    # over the 'model' mesh axis (requires a mesh context; train-step only)
    shard_condition_sequence: bool = False
    param_dtype: str = "float32"
    use_flash_attention: bool = True
    # test/dryrun hooks: override tower architectures with small ones
    eva_override: Optional[EvaVitConfig] = None
    bert_override: Optional[BertConfig] = None
    vision_override: Optional[object] = None   # non-EVA tower config
    audio_override: Optional[object] = None    # BeatsConfig | AstConfig

    @property
    def vision_dim(self) -> int:
        if self.vision_override is not None:
            ov = self.vision_override
            if hasattr(ov, "num_features"):            # Swin / VideoSwin
                return ov.num_features
            return ov.width                            # CLIP ViT
        if self.eva_override is not None:
            return self.eva_override.width
        if self.vision_encoder_type in ALT_VISION_DIMS:
            return ALT_VISION_DIMS[self.vision_encoder_type]
        return VISION_ENCODER_TYPES[self.vision_encoder_type][1]

    @property
    def multimodal_dim(self) -> int:
        if self.bert_override is not None:
            return self.bert_override.hidden_size
        return 768

    @property
    def audio_dim(self) -> int:
        # 'shared': audio reuses the vision encoder (model/mico.py:92-96);
        # beats/ast towers output 768 (general_module.py:253,274)
        if self.audio_encoder_type != "shared":
            if self.audio_override is not None:
                ov = self.audio_override
                return getattr(ov, "encoder_embed_dim", None) or ov.hidden_size
            return AUDIO_ENCODER_DIMS[self.audio_encoder_type]
        return self.vision_dim

    @property
    def depth_dim(self) -> int:
        return self.vision_dim

    @property
    def eva_config(self) -> EvaVitConfig:
        if self.eva_override is not None:
            return self.eva_override
        return eva_config_for_encoder_type(
            self.vision_encoder_type, self.vision_resolution
        )

    @property
    def vision_tower_config(self):
        """Config object for the configured vision tower (any family)."""
        if self.vision_override is not None:
            return self.vision_override
        t = self.vision_encoder_type
        if t.startswith("evaclip"):
            return self.eva_config
        if t.startswith("clip"):
            from mico_tpu.models.clip_vit import CLIP_VIT_CONFIGS

            name = {
                "clip_vit_base_16": "clip_vit_base_16",
                "clip_vit_base_32": "clip_vit_base_16",
                "clip_vit_large_14_336px": "clip_vit_large_14",
            }[t]
            return CLIP_VIT_CONFIGS[name]
        if t.startswith("videoswin"):
            from mico_tpu.models.swin import VIDEOSWIN_CONFIGS

            return VIDEOSWIN_CONFIGS["videoswin_base"]
        if t.startswith("swin"):
            from mico_tpu.models.swin import SWIN_CONFIGS

            return SWIN_CONFIGS["swin_base_patch4_window7_224_22k"]
        raise NotImplementedError(t)

    @property
    def audio_tower_config(self):
        """Config for the separate audio tower (None when 'shared')."""
        if self.audio_encoder_type == "shared":
            return None
        if self.audio_override is not None:
            return self.audio_override
        from mico_tpu.models.audio import AstConfig, BeatsConfig

        if self.audio_encoder_type == "beats":
            return BeatsConfig()
        return AstConfig(
            audio_melbins=self.audio_melbins,
            audio_target_length=self.audio_target_length,
        )

    @property
    def bert_config(self) -> BertConfig:
        if self.bert_override is not None:
            return self.bert_override
        return BertConfig()

    def dtypes(self) -> Tuple[jnp.dtype, jnp.dtype]:
        return (
            jnp.dtype(self.param_dtype),
            jnp.dtype(self.compute_dtype),
        )


def mico_config_from_dict(d: dict) -> MiCoConfig:
    """Build a MiCoConfig from a (possibly larger) reference-style model_cfg
    dict, ignoring keys we don't model. `eva_override`/`bert_override` may be
    given as plain dicts (e.g. from a JSON experiment config) and are lifted
    into their dataclasses."""
    names = {f.name for f in dataclasses.fields(MiCoConfig)}
    kw = {k: v for k, v in d.items() if k in names}
    if isinstance(kw.get("eva_override"), dict):
        kw["eva_override"] = EvaVitConfig(**kw["eva_override"])
    if isinstance(kw.get("bert_override"), dict):
        kw["bert_override"] = BertConfig(**kw["bert_override"])
    return MiCoConfig(**kw)
