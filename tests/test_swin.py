"""Swin 2D / VideoSwin 3D: golden parity vs the torch reference."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mico_tpu.models.swin import (
    SwinConfig,
    VideoSwinConfig,
    init_swin,
    init_videoswin,
    swin_encode_audio,
    swin_forward_features,
    swin_from_torch,
    videoswin_forward,
    videoswin_from_torch,
)
from reference_loader import install_stubs


def _load_ref(name, path):
    install_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_swin_mod():
    return _load_ref("ref_swin", "/root/reference/model/swin.py")


@pytest.fixture(scope="module")
def ref_videoswin_mod():
    return _load_ref(
        "ref_videoswin",
        "/root/reference/data/model/vision_encoders/videoswin/videoswin.py",
    )


def _randomize(model, seed=1):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    model.eval()
    return model


CFG2D = SwinConfig(
    img_size=56, embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=7
)


def test_swin2d_parity(ref_swin_mod):
    ref = ref_swin_mod.SwinTransformer(
        img_size=CFG2D.img_size, patch_size=4, embed_dim=CFG2D.embed_dim,
        depths=list(CFG2D.depths), num_heads=list(CFG2D.num_heads),
        window_size=CFG2D.window_size, drop_path_rate=0.0,
    )
    _randomize(ref)
    params = swin_from_torch(ref.state_dict(), CFG2D)
    x = np.random.default_rng(0).standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_features(torch.from_numpy(x)).numpy()
    got = np.asarray(swin_forward_features(params, CFG2D, jnp.asarray(x)))
    assert got.shape == want.shape  # (2, 196/4... tokens, num_features)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_swin2d_encode_audio_parity(ref_swin_mod):
    ref = ref_swin_mod.SwinTransformer(
        img_size=56, patch_size=4, embed_dim=32, depths=[2, 2],
        num_heads=[2, 4], window_size=7, drop_path_rate=0.0,
    )
    _randomize(ref, seed=2)
    params = swin_from_torch(ref.state_dict(), CFG2D)
    spec = np.random.default_rng(1).standard_normal((2, 1, 56, 56)).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_audio(torch.from_numpy(spec)).numpy()
    got = np.asarray(swin_encode_audio(params, CFG2D, jnp.asarray(spec)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_swin2d_shifted_window_mask_matters():
    """The shifted blocks must differ from unshifted — guards against the
    mask being silently dropped."""
    params = init_swin(jax.random.PRNGKey(0), CFG2D)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 3, 56, 56)), jnp.float32
    )
    base = swin_forward_features(params, CFG2D, x)
    # same weights, deeper even-only depths (no shifted blocks) ≠ base
    cfg_noshift = SwinConfig(
        img_size=56, embed_dim=32, depths=(1, 1), num_heads=(2, 4), window_size=7
    )
    trimmed = dict(params)
    trimmed["layers"] = [
        {**params["layers"][0], "blocks": params["layers"][0]["blocks"][:1]},
        {**params["layers"][1], "blocks": params["layers"][1]["blocks"][:1]},
    ]
    other = swin_forward_features(trimmed, cfg_noshift, x)
    assert not np.allclose(np.asarray(base), np.asarray(other))


CFG3D = VideoSwinConfig(
    embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=(8, 7, 7)
)


def test_videoswin_parity(ref_videoswin_mod):
    ref = ref_videoswin_mod.SwinTransformer3D(
        patch_size=(2, 4, 4), embed_dim=32, depths=[2, 2], num_heads=[2, 4],
        window_size=(8, 7, 7), drop_path_rate=0.0, time_stride=1,
    )
    _randomize(ref)
    params = videoswin_from_torch(ref.state_dict(), CFG3D)
    # 4 frames, 56x56: exercises time padding (+1), window shrink on D (5<8)
    x = np.random.default_rng(0).standard_normal((1, 3, 4, 56, 56)).astype(
        np.float32
    )
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(videoswin_forward(params, CFG3D, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_videoswin_nondivisible_spatial(ref_videoswin_mod):
    """60x60 input: H/W pad to patch multiples and window pad inside blocks."""
    ref = ref_videoswin_mod.SwinTransformer3D(
        patch_size=(2, 4, 4), embed_dim=32, depths=[2, 2], num_heads=[2, 4],
        window_size=(8, 7, 7), drop_path_rate=0.0, time_stride=1,
    )
    _randomize(ref, seed=3)
    params = videoswin_from_torch(ref.state_dict(), CFG3D)
    x = np.random.default_rng(2).standard_normal((1, 3, 3, 60, 60)).astype(
        np.float32
    )
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(videoswin_forward(params, CFG3D, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_init_shapes_roundtrip():
    p2 = init_swin(jax.random.PRNGKey(0), CFG2D)
    out = swin_forward_features(
        p2, CFG2D, jnp.zeros((1, 3, 56, 56), jnp.float32)
    )
    assert out.shape == (1, (56 // 4 // 2) ** 2, CFG2D.num_features)
    p3 = init_videoswin(jax.random.PRNGKey(0), CFG3D)
    out = videoswin_forward(p3, CFG3D, jnp.zeros((1, 3, 4, 56, 56), jnp.float32))
    assert out.shape[:2] == (1, CFG3D.num_features)


def test_swin_train_regularizers_contract():
    """train_rng activates dropout + the stochastic-depth schedule
    (reference model/swin.py:175-258); no rng → exact eval graph."""
    import dataclasses

    cfg = dataclasses.replace(CFG2D, drop_path_rate=0.5, drop_rate=0.1,
                              attn_drop_rate=0.1)
    p = init_swin(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 3, 56, 56)), jnp.float32
    )
    base = swin_forward_features(p, cfg, x)
    eval_again = swin_forward_features(p, cfg, x, train_rng=None)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(eval_again))
    t1 = swin_forward_features(p, cfg, x, train_rng=jax.random.PRNGKey(1))
    t2 = swin_forward_features(p, cfg, x, train_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(base), np.asarray(t1))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    # rates=0 + rng == eval graph exactly
    cfg0 = dataclasses.replace(CFG2D, drop_path_rate=0.0, drop_rate=0.0,
                               attn_drop_rate=0.0)
    t0 = swin_forward_features(p, cfg0, x, train_rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(t0), rtol=1e-6, atol=1e-6
    )


def test_videoswin_train_regularizers_contract():
    import dataclasses

    cfg = dataclasses.replace(CFG3D, drop_path_rate=0.5, drop_rate=0.1)
    p = init_videoswin(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3, 4, 56, 56)),
        jnp.float32,
    )
    base = videoswin_forward(p, cfg, x)
    t1 = videoswin_forward(p, cfg, x, train_rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(base), np.asarray(t1))
    # magnitude sanity: inverted dropout keeps the scale in the same ballpark
    assert 0.3 < float(jnp.std(t1) / jnp.std(base)) < 3.0
