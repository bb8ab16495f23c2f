"""Golden parity for the CLIP text tower (reference
model/evaclip/transformer.py:711-806 TextTransformer) and the two-tower
assembly, plus the ViT training regularizers (PatchDropout / DropPath)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_loader import REF, _package_shell, install_stubs

from mico_tpu.config import EvaVitConfig
from mico_tpu.models.clip_text import (
    ClipTextConfig,
    clip_forward,
    clip_text_forward,
    clip_text_from_torch,
    init_clip,
    init_clip_text,
)

TXT_CFG = ClipTextConfig(
    context_length=24, vocab_size=130, width=32, heads=2, layers=2,
    output_dim=16,
)


@pytest.fixture(scope="module")
def ref_text():
    install_stubs()
    _package_shell("refclip", f"{REF}/model/evaclip")
    tf = importlib.import_module("refclip.transformer")
    model = tf.TextTransformer(
        context_length=TXT_CFG.context_length,
        vocab_size=TXT_CFG.vocab_size,
        width=TXT_CFG.width,
        heads=TXT_CFG.heads,
        layers=TXT_CFG.layers,
        output_dim=TXT_CFG.output_dim,
    )
    model.eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.04)
    return model


def _token_batch(rng, b, l, ctx):
    # ids strictly below EOT so argmax pooling lands on the EOT slot
    ids = np.zeros((b, ctx), np.int64)
    for i in range(b):
        ids[i, 0] = TXT_CFG.vocab_size - 2          # SOT
        ids[i, 1 : l - 1] = rng.integers(4, 100, (l - 2,))
        ids[i, l - 1] = TXT_CFG.vocab_size - 1      # EOT
    return ids


def test_text_tower_golden(ref_text):
    rng = np.random.default_rng(0)
    ids = _token_batch(rng, 3, 11, TXT_CFG.context_length)
    with torch.no_grad():
        want = ref_text(torch.from_numpy(ids)).numpy()
    params = clip_text_from_torch(ref_text.state_dict(), TXT_CFG)
    got = np.asarray(clip_text_forward(params, TXT_CFG, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_text_tower_all_features(ref_text):
    rng = np.random.default_rng(1)
    ids = _token_batch(rng, 2, 9, TXT_CFG.context_length)
    with torch.no_grad():
        want = ref_text(
            torch.from_numpy(ids), return_all_features=True
        ).numpy()
    params = clip_text_from_torch(ref_text.state_dict(), TXT_CFG)
    got = np.asarray(
        clip_text_forward(
            params, TXT_CFG, jnp.asarray(ids), return_all_features=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


TINY_EVA = EvaVitConfig(
    image_size=28, patch_size=14, layers=2, width=32, head_width=16,
    mlp_ratio=4.0, embed_dim=16,
)


def test_two_tower_clip_shapes():
    params = init_clip(jax.random.PRNGKey(0), TINY_EVA, TXT_CFG)
    rng = np.random.default_rng(2)
    pixels = jnp.asarray(rng.standard_normal((2, 3, 28, 28)), jnp.float32)
    ids = jnp.asarray(_token_batch(rng, 2, 7, TXT_CFG.context_length))
    img, txt, scale = clip_forward(params, TINY_EVA, TXT_CFG, pixels, ids)
    assert img.shape == (2, 16) and txt.shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(img), axis=-1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(float(scale), 1.0 / 0.07, rtol=1e-5)


def test_patch_dropout_and_droppath():
    from dataclasses import replace

    from mico_tpu.models.eva_vit import eva_vit_forward, init_eva_vit

    cfg = replace(TINY_EVA, patch_dropout=0.5, drop_path_rate=0.3)
    params = init_eva_vit(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 3, 28, 28)), jnp.float32
    )
    # eval: regularizers off, full sequence
    full = eva_vit_forward(params, cfg, x)
    assert full.shape == (2, 5, 32)
    # train: 4 patches -> keep 2 (+CLS)
    dropped = eva_vit_forward(
        params, cfg, x, train_rng=jax.random.PRNGKey(1)
    )
    assert dropped.shape == (2, 3, 32)
    # different rng, different subset/paths
    dropped2 = eva_vit_forward(
        params, cfg, x, train_rng=jax.random.PRNGKey(2)
    )
    assert not np.allclose(np.asarray(dropped), np.asarray(dropped2))
    # zero rates with a train rng reduces to the eval forward
    cfg0 = replace(TINY_EVA, patch_dropout=0.0, drop_path_rate=0.0)
    same = eva_vit_forward(
        params, cfg0, x, train_rng=jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(np.asarray(same), np.asarray(full), atol=1e-6)


def test_factory_registry():
    from mico_tpu.models.clip_text import create_model

    v, t, p = create_model("EVA01-CLIP-g-14")
    assert v.width == 1408 and v.layers == 40 and v.head_width == 88
    assert t.width == 768 and t.output_dim == 1024
    assert p is None
    v336, _, _ = create_model("EVA02-CLIP-L-14", image_size=336)
    assert v336.image_size == 336 and v336.grid_size == 24
    with pytest.raises(KeyError):
        create_model("nope")


def test_zero_shot_classifier():
    from mico_tpu.models.clip_text import build_zero_shot_classifier

    params = init_clip(jax.random.PRNGKey(0), TINY_EVA, TXT_CFG)

    class FakeTok:
        def __call__(self, texts, ctx):
            rng = np.random.default_rng(abs(hash(tuple(texts))) % 2**31)
            ids = np.zeros((len(texts), ctx), np.int32)
            for i in range(len(texts)):
                ids[i, 0] = TXT_CFG.vocab_size - 2
                ids[i, 1:5] = rng.integers(4, 100, 4)
                ids[i, 5] = TXT_CFG.vocab_size - 1
            return ids

    w = build_zero_shot_classifier(
        params, TXT_CFG, ["cat", "dog", "tpu"],
        templates=("a photo of a {}.", "an image of a {}."),
        tokenizer=FakeTok(),
    )
    assert w.shape == (3, TXT_CFG.output_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(w), axis=-1), 1.0, rtol=1e-5
    )
