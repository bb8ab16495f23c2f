"""Encoder zoo wired into the MiCo/VAST surface: every vision/audio tower
combination must flow through compute_features → task losses end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mico_tpu.config import BertConfig, EvaVitConfig, MiCoConfig
from mico_tpu.models import mico as mico_mod
from mico_tpu.models.audio import AstConfig, BeatsConfig
from mico_tpu.models.clip_vit import ClipVitConfig
from mico_tpu.models.swin import SwinConfig, VideoSwinConfig
from mico_tpu.train.objectives import task_losses

BERT = BertConfig(
    hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=128, encoder_width=64,
)
EVA = EvaVitConfig(
    image_size=28, patch_size=14, layers=2, width=64, head_width=32,
    embed_dim=64,
)
COMMON = dict(
    bert_override=BERT, compute_dtype="float32", use_flash_attention=False,
    max_vision_sample_num=2, max_audio_sample_num=2,
)


def _batch(rng, b=2, res=28, amel=32, alen=32):
    return {
        "vision_pixels": jnp.asarray(
            rng.standard_normal((b, 2, 3, res, res)), jnp.float32
        ),
        "audio_spectrograms": jnp.asarray(
            rng.standard_normal((b, 2, alen, amel)), jnp.float32
        ),
        "caption_ids": jnp.asarray(
            rng.integers(200, 20000, (b, 10)), jnp.int32
        ).at[:, 0].set(101),
        "caption_mask": jnp.ones((b, 10), jnp.int32),
    }


def _run(cfg, rng, **bkw):
    params = mico_mod.init_mico(jax.random.PRNGKey(0), cfg)
    losses = task_losses(
        jax.random.PRNGKey(1), params, cfg, _batch(rng, **bkw),
        "ret%tva_cap%tva", axis_name=None,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    return losses


def test_shared_audio_with_eva(rng):
    # shared route: fbank slices are "spectrogram images" at the vision
    # resolution (model/mico.py:139-143; demo melbins=target=224)
    cfg = MiCoConfig(eva_override=EVA, **COMMON)
    _run(cfg, rng, amel=28, alen=28)


def test_beats_audio_tower(rng):
    cfg = MiCoConfig(
        eva_override=EVA, audio_encoder_type="beats",
        audio_override=BeatsConfig(
            embed_dim=24, encoder_layers=2, encoder_embed_dim=32,
            encoder_ffn_embed_dim=64, encoder_attention_heads=2,
            conv_pos=8, conv_pos_groups=2, num_buckets=8, max_distance=16,
        ),
        **COMMON,
    )
    assert cfg.audio_dim == 32
    _run(cfg, rng)


def test_ast_audio_tower(rng):
    cfg = MiCoConfig(
        eva_override=EVA, audio_encoder_type="ast",
        audio_override=AstConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, audio_melbins=32, audio_target_length=32,
        ),
        **COMMON,
    )
    assert cfg.audio_dim == 32
    _run(cfg, rng)


def test_clip_vision_tower(rng):
    cfg = MiCoConfig(
        vision_encoder_type="clip_vit_base_16",
        vision_override=ClipVitConfig(
            input_resolution=32, patch_size=16, width=64, layers=2, heads=2,
            output_dim=32,
        ),
        **COMMON,
    )
    assert cfg.vision_dim == 64
    _run(cfg, rng, res=32)


def test_swin_vision_tower(rng):
    cfg = MiCoConfig(
        vision_encoder_type="swin_base_patch4_window7_224_22k",
        vision_override=SwinConfig(
            img_size=56, embed_dim=16, depths=(1, 1), num_heads=(2, 2),
            window_size=7,
        ),
        **COMMON,
    )
    assert cfg.vision_dim == 32
    _run(cfg, rng, res=56, amel=56, alen=56)


def test_videoswin_vision_tower(rng):
    cfg = MiCoConfig(
        vision_encoder_type="videoswin_base",
        vision_override=VideoSwinConfig(
            embed_dim=16, depths=(1, 1), num_heads=(2, 2),
            window_size=(4, 7, 7),
        ),
        **COMMON,
    )
    assert cfg.vision_dim == 32
    _run(cfg, rng, res=56, amel=56, alen=56)
