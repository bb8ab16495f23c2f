"""OpenAI-CLIP ViT: golden parity vs the torch reference."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mico_tpu.models.clip_vit import (
    ClipVitConfig,
    clip_vit_forward,
    clip_vit_forward_audio,
    clip_vit_from_torch,
    init_clip_vit,
)


@pytest.fixture(scope="module")
def ref_clip_mod():
    spec = importlib.util.spec_from_file_location(
        "ref_clip", "/root/reference/model/clip/clip.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_clip"] = mod
    spec.loader.exec_module(mod)
    return mod


CFG = ClipVitConfig(
    input_resolution=32, patch_size=16, width=48, layers=2, heads=4,
    output_dim=32,
)


def _build_ref(mod, adaptor_layers=0, seed=1):
    ref = mod.VisionTransformer(
        input_resolution=CFG.input_resolution, patch_size=CFG.patch_size,
        width=CFG.width, layers=CFG.layers, heads=CFG.heads,
        output_dim=CFG.output_dim, adaptor_layers=adaptor_layers,
    )
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    ref.eval()
    return ref


def test_clip_vit_parity(ref_clip_mod):
    ref = _build_ref(ref_clip_mod)
    params = clip_vit_from_torch(ref.state_dict(), CFG)
    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want_all = ref(torch.from_numpy(x), return_all_features=True).numpy()
        want_cls = ref(torch.from_numpy(x), return_all_features=False).numpy()
    got_all = np.asarray(clip_vit_forward(params, CFG, jnp.asarray(x)))
    got_cls = np.asarray(
        clip_vit_forward(params, CFG, jnp.asarray(x), return_all_features=False)
    )
    np.testing.assert_allclose(got_all, want_all, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_cls, want_cls, rtol=2e-4, atol=2e-4)


def test_clip_vit_adaptor_parity(ref_clip_mod):
    cfg = ClipVitConfig(
        input_resolution=32, patch_size=16, width=48, layers=2, heads=4,
        output_dim=32, adaptor_layers=1,
    )
    ref = _build_ref(ref_clip_mod, adaptor_layers=1, seed=2)
    params = clip_vit_from_torch(ref.state_dict(), cfg)
    x = np.random.default_rng(1).standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), return_all_features=True).numpy()
    got = np.asarray(clip_vit_forward(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clip_vit_forward_audio_parity(ref_clip_mod):
    ref = _build_ref(ref_clip_mod, seed=3)
    params = clip_vit_from_torch(ref.state_dict(), CFG)
    toks = np.random.default_rng(2).standard_normal((2, 5, 48)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_audio(
            torch.from_numpy(toks), return_all_features=True
        ).numpy()
    got = np.asarray(clip_vit_forward_audio(params, CFG, jnp.asarray(toks)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_init_shapes():
    p = init_clip_vit(jax.random.PRNGKey(0), CFG)
    out = clip_vit_forward(p, CFG, jnp.zeros((1, 3, 32, 32), jnp.float32))
    assert out.shape == (1, 5, 48)
    out = clip_vit_forward(
        p, CFG, jnp.zeros((1, 3, 32, 32), jnp.float32), return_all_features=False
    )
    assert out.shape == (1, 32)
