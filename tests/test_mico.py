"""End-to-end MiCo assembly parity vs the full reference model
(model/mico.py) with random weights — covers the shared-encoder modality
routing, pooling rules, contra/ITM heads, condition-feature builders
(frame/type embeddings, nearest interp) and the checkpoint converter."""

import contextlib
import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mico_tpu.config import MiCoConfig
from mico_tpu.models.mico import MiCoModel

from reference_loader import REF, load_mico_module

CFG_DICT = dict(
    vision_encoder_type="evaclip02_base",
    vision_resolution=64,
    contra_dim=32,
    frame_embedding_type="adaptive",
    max_vision_sample_num=3,
    max_audio_sample_num=2,
    max_depth_sample_num=2,
    pool_video=False,
    beam_size=2,
    itm_ratio=1.0,
    max_caption_len=20,
    max_omni_caption_len=30,
    max_subtitle_len=20,
    checkpointing=False,
)


@pytest.fixture(scope="module")
def ref_model():
    mod = load_mico_module()
    import easydict

    cwd = os.getcwd()
    try:
        os.chdir(REF)
        torch.manual_seed(0)
        model = mod.MiCo(easydict.EasyDict(CFG_DICT))
    finally:
        os.chdir(cwd)
    model.eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    return model


@pytest.fixture(scope="module")
def ours(ref_model):
    cfg = MiCoConfig(
        **{
            k: CFG_DICT[k]
            for k in (
                "vision_encoder_type", "vision_resolution", "contra_dim",
                "frame_embedding_type", "max_vision_sample_num",
                "max_audio_sample_num", "max_depth_sample_num", "pool_video",
                "beam_size", "itm_ratio", "max_caption_len",
                "max_omni_caption_len", "max_subtitle_len",
            )
        },
        compute_dtype="float32",
        use_flash_attention=False,
    )
    return MiCoModel.from_pretrained(cfg, ref_model.state_dict())


@pytest.fixture(scope="module")
def vision_outputs(rng_mod, ref_model, ours):
    pixels = rng_mod.standard_normal((2, 2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref_model.forward_vision_encoder(torch.from_numpy(pixels))
    got = ours.forward_vision_encoder(jnp.asarray(pixels))
    return pixels, want, got


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(11)


def test_vision_encoder_parity(vision_outputs):
    _, want, got = vision_outputs
    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=5e-4, atol=5e-4)


def test_contra_feature_parity(vision_outputs, ref_model, ours):
    _, want, got = vision_outputs
    with torch.no_grad():
        pooled_ref = ref_model.pool_vision_for_contra(want)
        feat_ref = F.normalize(ref_model.contra_head_v(pooled_ref), dim=-1).numpy()
    pooled = ours.pool_vision_for_contra(got)
    feat = np.asarray(ours.contra_head("v", pooled))
    feat = feat / np.linalg.norm(feat, axis=-1, keepdims=True)
    np.testing.assert_allclose(feat, feat_ref, rtol=1e-3, atol=1e-3)
    cos = (feat * feat_ref).sum(-1)
    assert (cos > 0.999).all()


def test_audio_encoder_parity(rng_mod, ref_model, ours):
    spec = rng_mod.standard_normal((1, 2, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref_model.forward_audio_encoder(torch.from_numpy(spec)).numpy()
    got = np.asarray(ours.forward_audio_encoder(jnp.asarray(spec)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_text_branch_parity(rng_mod, ref_model, ours):
    ids = rng_mod.integers(5, 30000, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0
    with torch.no_grad():
        seq_ref = ref_model.forward_multimodal_encoder(
            torch.from_numpy(ids), torch.from_numpy(mask)
        ).sequence_output
        feat_ref = F.normalize(
            ref_model.contra_head_t(ref_model.pool_text_for_contra(seq_ref)), dim=-1
        ).numpy()
    seq = ours.forward_multimodal_encoder(jnp.asarray(ids), jnp.asarray(mask))
    feat = np.asarray(ours.contra_head("t", ours.pool_text_for_contra(seq)))
    feat = feat / np.linalg.norm(feat, axis=-1, keepdims=True)
    np.testing.assert_allclose(feat, feat_ref, rtol=1e-3, atol=1e-3)


def test_itm_path_parity(rng_mod, vision_outputs, ref_model, ours):
    _, want_vis, got_vis = vision_outputs
    ids = rng_mod.integers(5, 30000, (2, 10))
    mask = np.ones((2, 10), np.int64)
    with torch.no_grad():
        # n=2 != max_vision_sample_num=3 → exercises nearest frame-embed interp
        cond_ref = ref_model.get_multimodal_forward_input_vision(want_vis)
        seq_ref = ref_model.forward_multimodal_encoder(
            torch.from_numpy(ids), torch.from_numpy(mask), cond_ref
        ).sequence_output
        scores_ref = F.softmax(ref_model.itm_head(seq_ref[:, 0]), dim=1)[:, 1].numpy()
    cond = ours.get_multimodal_forward_input_vision(got_vis)
    np.testing.assert_allclose(
        np.asarray(cond), cond_ref.numpy(), rtol=5e-4, atol=5e-4
    )
    seq = ours.forward_multimodal_encoder(
        jnp.asarray(ids), jnp.asarray(mask), cond
    )
    import jax

    scores = np.asarray(jax.nn.softmax(ours.itm_head(seq[:, 0]), axis=1)[:, 1])
    np.testing.assert_allclose(scores, scores_ref, rtol=1e-3, atol=1e-3)
