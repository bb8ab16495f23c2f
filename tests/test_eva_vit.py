"""EVA ViT golden parity: our JAX implementation vs the PyTorch reference
(model/evaclip/eva_vit_model.py) with identical random weights."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mico_tpu.config import EvaVitConfig
from mico_tpu.convert import eva_vit_from_torch
from mico_tpu.models.eva_vit import eva_vit_forward

from reference_loader import load_eva_vit_module


def build_reference(cfg: EvaVitConfig, rope_env: str, **extra):
    os.environ["RoPE"] = rope_env
    mod = load_eva_vit_module()
    torch.manual_seed(0)
    model = mod.EVAVisionTransformer(
        **extra,
        img_size=cfg.image_size,
        patch_size=cfg.patch_size,
        num_classes=cfg.embed_dim,
        use_mean_pooling=cfg.global_average_pool,
        init_values=cfg.ls_init_value,
        patch_dropout=0.0,
        embed_dim=cfg.width,
        depth=cfg.layers,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        qkv_bias=cfg.qkv_bias,
        drop_path_rate=0.0,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=cfg.ln_eps),
        xattn=False,
        rope=cfg.rope,
        postnorm=cfg.postnorm,
        pt_hw_seq_len=cfg.pt_hw_seq_len,
        intp_freq=cfg.intp_freq,
        naiveswiglu=cfg.naiveswiglu,
        subln=cfg.subln,
    )
    model.eval()
    # randomize weights meaningfully (default init leaves many zeros)
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    return model


CASES = {
    # mini version of EVA01-CLIP-g-14 (MiCo flagship): fused qkv + q/v bias,
    # MLP-GELU, final LN, mlp_ratio trunc
    "eva01_mini": EvaVitConfig(
        image_size=56, patch_size=14, layers=3, width=64, head_width=16,
        mlp_ratio=4.3637, embed_dim=32,
    ),
    # EVA02 style: RoPE + SwiGLU + subln (split qkv in reference)
    "eva02_mini": EvaVitConfig(
        image_size=64, patch_size=16, layers=2, width=64, head_width=16,
        mlp_ratio=2.6667, embed_dim=32, rope=True, intp_freq=True,
        naiveswiglu=True, subln=True,
    ),
    # bigE style: postnorm
    "postnorm_mini": EvaVitConfig(
        image_size=56, patch_size=14, layers=2, width=64, head_width=16,
        mlp_ratio=4.0, embed_dim=32, postnorm=True,
    ),
    # layerscale (EVA01-B)
    "layerscale_mini": EvaVitConfig(
        image_size=32, patch_size=16, layers=2, width=32, head_width=16,
        mlp_ratio=4.0, embed_dim=16, ls_init_value=0.1,
    ),
}


@pytest.mark.parametrize("name", list(CASES))
def test_eva_vit_parity(rng, name):
    cfg = CASES[name]
    ref = build_reference(cfg, rope_env="1" if cfg.rope else "0")
    x = rng.standard_normal((2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)

    with torch.no_grad():
        want = ref.forward_features(torch.from_numpy(x), return_all_features=True)
    want = want.numpy()

    params = eva_vit_from_torch(ref.state_dict(), cfg)
    got = np.asarray(
        eva_vit_forward(params, cfg, jnp.asarray(x), return_all_features=True)
    )

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    cos = np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.99999


def test_eva_vit_shared_rel_pos_bias(rng):
    """BEiT-style shared relative position bias
    (eva_vit_model.py:451-485,514-517)."""
    from dataclasses import replace

    cfg = replace(CASES["eva01_mini"], use_shared_rel_pos_bias=True)
    ref = build_reference(cfg, rope_env="0", use_shared_rel_pos_bias=True)
    x = rng.standard_normal((2, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32
    )
    with torch.no_grad():
        want = ref.forward_features(
            torch.from_numpy(x), return_all_features=True
        ).numpy()
    params = eva_vit_from_torch(ref.state_dict(), cfg)
    assert "rel_pos_bias_table" in params
    got = np.asarray(
        eva_vit_forward(params, cfg, jnp.asarray(x), return_all_features=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_eva_vit_pooled_output(rng):
    cfg = CASES["eva01_mini"]
    ref = build_reference(cfg, rope_env="0")
    x = rng.standard_normal((1, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_features(torch.from_numpy(x), return_all_features=False).numpy()
    params = eva_vit_from_torch(ref.state_dict(), cfg)
    got = np.asarray(
        eva_vit_forward(params, cfg, jnp.asarray(x), return_all_features=False)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["plain", "layerscale", "swiglu_subln",
                                     "postnorm"])
def test_fold_inference_params(rng, variant):
    """fold_inference_params is a reparametrization: folded forward matches
    the canonical forward (LN affines into consuming matmuls, LayerScale
    into producing matmuls; coherent weight-rounding drift stays orders of
    magnitude below bf16 deployment noise)."""
    from mico_tpu.models.eva_vit import fold_inference_params, init_eva_vit
    import jax

    kw = {
        "plain": {},
        "layerscale": dict(ls_init_value=0.1),
        "swiglu_subln": dict(naiveswiglu=True, subln=True),
        "postnorm": dict(postnorm=True),
    }[variant]
    cfg = EvaVitConfig(image_size=28, patch_size=14, layers=3, width=64,
                       head_width=32, embed_dim=32, **kw)
    params = init_eva_vit(jax.random.PRNGKey(0), cfg)
    # randomize LN affines and biases so the fold is non-trivial
    leaves, td = jax.tree.flatten(params)
    key = jax.random.PRNGKey(7)
    rand = []
    for a in leaves:
        key, k2 = jax.random.split(key)
        rand.append(a + 0.03 * jax.random.normal(k2, a.shape, a.dtype))
    params = jax.tree.unflatten(td, rand)
    folded = fold_inference_params(params, cfg)
    if variant == "plain":
        assert "norm1_w" not in folded["blocks"]
        assert "qkv_bias" in folded["blocks"]
    x = jnp.asarray(rng.standard_normal((2, 3, 28, 28)), jnp.float32)
    y0 = np.asarray(eva_vit_forward(params, cfg, x))
    y1 = np.asarray(eva_vit_forward(folded, cfg, x))
    scale = np.abs(y0).max()
    assert np.abs(y1 - y0).max() / scale < 1e-3
    # cosine at deployment relevance (float64: fp32 dot saturates at ~1e-7)
    a, b = y0.ravel().astype(np.float64), y1.ravel().astype(np.float64)
    c = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert c > 1 - 1e-6
