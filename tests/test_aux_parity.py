"""Aux-surface parity: ResizeMaxSize transform, HF pooler registry,
pretrained registry."""

import numpy as np
import jax.numpy as jnp
import pytest


def test_resize_max_size_pads_square():
    from mico_tpu.media.processors import resize_max_size

    x = np.random.default_rng(0).random((1, 3, 60, 120)).astype(np.float32)
    out = resize_max_size(x, 48, fill=0.5)
    assert out.shape == (1, 3, 48, 48)
    # landscape: height scaled to 24, padded 12 top / 12 bottom with fill
    np.testing.assert_allclose(out[:, :, :12], 0.5)
    np.testing.assert_allclose(out[:, :, -12:], 0.5)
    assert not np.allclose(out[:, :, 12:36], 0.5)
    # already at max size: unchanged (reference scale==1.0 early-out)
    same = resize_max_size(x[..., :60], 60)
    np.testing.assert_array_equal(same, x[..., :60])


def test_poolers():
    from mico_tpu.text.hf_adapter import POOLERS, pool_and_project

    h = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 5, 8)), jnp.float32
    )
    m = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], jnp.int32)
    mean = POOLERS["mean_pooler"](h, m)
    np.testing.assert_allclose(
        np.asarray(mean[0]), np.asarray(h[0, :3].mean(0)), rtol=1e-6
    )
    mx = POOLERS["max_pooler"](h, m)
    np.testing.assert_allclose(
        np.asarray(mx[0]), np.asarray(h[0, :3].max(0)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(POOLERS["cls_pooler"](h, m)), np.asarray(h[:, 0])
    )
    proj = jnp.ones((8, 4), jnp.float32)
    out = pool_and_project(h, m, "cls_pooler", proj)
    assert out.shape == (2, 4)


def test_pretrained_registry(tmp_path):
    from mico_tpu.utils import pretrained as P

    assert "EVA01-CLIP-g-14/laion400m" in P.list_pretrained()
    assert P.get_pretrained_url("BEATs", "iter3-plus-AS2M").startswith("http")
    with pytest.raises(KeyError):
        P.resolve_pretrained("nope", "x")
    with pytest.raises(FileNotFoundError):
        P.resolve_pretrained("BEATs", "iter3-plus-AS2M", cache=str(tmp_path))
    # place + verify
    f = tmp_path / "BEATs_iter3_plus_AS2M.pt"
    f.write_bytes(b"fake")
    assert P.resolve_pretrained(
        "BEATs", "iter3-plus-AS2M", cache=str(tmp_path)
    ) == str(f)
    assert P.verify_checkpoint(str(f), P.sha256_file(str(f))[:12])
    assert not P.verify_checkpoint(str(f), "deadbeef")


def test_profiling_utils():
    import jax
    from mico_tpu.config import EVA_VIT_CONFIGS
    from mico_tpu.utils.profiling import (
        StepTimer,
        annotate_fn,
        bert_flops,
        eva_vit_flops,
    )

    # ViT-g ≈ 0.52 TFLOP/frame (BASELINE.md estimate)
    g = eva_vit_flops(EVA_VIT_CONFIGS["EVA01-CLIP-g-14"])
    assert 0.4e12 < g < 0.7e12
    assert bert_flops(12, 768, 30, 3072, cross_len=257) > bert_flops(
        12, 768, 30, 3072
    )

    timer = StepTimer(warmup=0)
    with timer:
        out = jnp.ones((4,)) * 2
        timer.sync(out)
    assert timer.last_ms > 0 and timer.mean_ms > 0

    @annotate_fn
    def f(x):
        return x + 1

    assert float(f(jnp.asarray(1.0))) == 2.0


def test_download_corpus_gated(capsys):
    from mico_tpu.tools.download_corpus import V2D_CONFIG, main

    assert V2D_CONFIG["reading"]["yt_args"]["download_size"] == 360
    rc = main(["list.parquet", "./out"])
    assert rc == 1  # video2dataset absent here: print invocation, exit 1
    assert "video2dataset" in capsys.readouterr().out


def test_swin_yaml_config(tmp_path):
    from mico_tpu.models.swin import SWIN_CONFIGS, swin_config_from_yaml

    y = tmp_path / "swin.yaml"
    y.write_text(
        "DATA:\n  IMG_SIZE: 224\nMODEL:\n  TYPE: swin\n  SWIN:\n"
        "    EMBED_DIM: 128\n    DEPTHS: [ 2, 2, 18, 2 ]\n"
        "    NUM_HEADS: [ 4, 8, 16, 32 ]\n    WINDOW_SIZE: 7\n"
    )
    cfg = swin_config_from_yaml(str(y))
    assert cfg == SWIN_CONFIGS["swin_base_patch4_window7_224_22k"]


def test_hf_arch_poolers():
    from mico_tpu.text.hf_adapter import default_pooler_for

    assert default_pooler_for("roberta") == "mean_pooler"
    assert default_pooler_for("bert") == "cls_pooler"
    assert default_pooler_for("unknown-model") == "cls_pooler"
