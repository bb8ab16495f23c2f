"""Serving pipeline: threaded decode -> padded batches -> async device
dispatch, zero rows + reported indices for failed items."""

import wave as wave_mod

import jax
import numpy as np
import pytest

from mico_tpu.config import BertConfig, EvaVitConfig, MiCoConfig
from mico_tpu.models.mico import init_mico
from mico_tpu.serve import EmbeddingPipeline
from mico_tpu.text import BertWordPieceTokenizer

VOCAB = "/root/reference/model/tokenizer/vocab.txt"

CFG = MiCoConfig(
    eva_override=EvaVitConfig(image_size=28, patch_size=14, layers=1,
                              width=32, head_width=16, embed_dim=16),
    bert_override=BertConfig(hidden_size=32, num_hidden_layers=1,
                             num_attention_heads=2, intermediate_size=64,
                             encoder_width=32),
    contra_dim=16, vision_resolution=28, max_vision_sample_num=2,
    max_audio_sample_num=2, compute_dtype="float32",
    use_flash_attention=False,
)


@pytest.fixture(scope="module")
def pipe():
    params = init_mico(jax.random.PRNGKey(0), CFG)
    tok = BertWordPieceTokenizer(VOCAB)
    return EmbeddingPipeline(params, CFG, tok, batch_size=3, io_workers=2,
                             melbins=28, target_length=28,
                             resize_melbin_num=28)


def test_embed_images_with_failures(pipe, tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (40, 44, 3), dtype=np.uint8))
        paths.append(p)
    paths.insert(2, str(tmp_path / "missing.jpg"))   # decode failure
    feats = pipe.embed_images(paths)
    assert feats.shape == (6, 16)
    assert pipe.last_failures == [2]
    np.testing.assert_allclose(feats[2], 0.0)
    norms = np.linalg.norm(feats, axis=-1)
    np.testing.assert_allclose(np.delete(norms, 2), 1.0, rtol=1e-5)


def test_embed_audio_and_texts(pipe, tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"a{i}.wav")
        w = (rng.standard_normal(8000) * 0.1).clip(-1, 1)
        with wave_mod.open(p, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes((w * 32767).astype(np.int16).tobytes())
        paths.append(p)
    af = pipe.embed_audio(paths)
    assert af.shape == (4, 16) and not pipe.last_failures
    tf = pipe.embed_texts(["a dog barks", "music plays", "silence"])
    assert tf.shape == (3, 16)
    sims = pipe.similarity(tf, af)
    assert sims.shape == (3, 4)
    assert np.isfinite(sims).all()


def test_fold_constants_equivalence(pipe, tmp_path):
    """The serving pipeline's folded params (mico.fold_inference_params,
    fold_constants=True default) produce the same embeddings as the
    canonical layout."""
    import cv2

    rng = np.random.default_rng(2)
    p = str(tmp_path / "im.jpg")
    cv2.imwrite(p, rng.integers(0, 255, (40, 44, 3), dtype=np.uint8))
    params = init_mico(jax.random.PRNGKey(0), CFG)
    tok = BertWordPieceTokenizer(VOCAB)
    raw = EmbeddingPipeline(params, CFG, tok, batch_size=3, io_workers=2,
                            melbins=28, target_length=28,
                            resize_melbin_num=28, fold_constants=False)
    assert "norm1_w" in raw.params["vision_encoder"]["blocks"]
    assert "norm1_w" not in pipe.params["vision_encoder"]["blocks"]
    np.testing.assert_allclose(
        pipe.embed_images([p]), raw.embed_images([p]), rtol=2e-5, atol=2e-6
    )
