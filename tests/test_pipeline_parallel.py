"""GPipe-style pipeline parallelism: forward and gradient equivalence vs
the sequential layer scan on a virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mico_tpu.parallel.pipeline_parallel import pipelined


def layer_fn(lp, x):
    # lp leaves: (layers_per_stage, ...) — apply them in order
    def body(h, p):
        w, b = p
        return jnp.tanh(h @ w + b), None

    out, _ = jax.lax.scan(body, x, (lp["w"], lp["b"]))
    return out


def sequential(params, x):
    def body(h, p):
        w, b = p
        return jnp.tanh(h @ w + b), None

    out, _ = jax.lax.scan(body, x, (params["w"], params["b"]))
    return out


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 2)])
def test_pipeline_matches_sequential(n_stages, n_micro):
    from jax.sharding import Mesh

    rng = np.random.default_rng(0)
    L, D, B = 8, 16, 8
    params = {
        "w": jnp.asarray(rng.standard_normal((L, D, D)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((L, D)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    devs = np.array(jax.devices()[:n_stages])
    mesh = Mesh(devs, ("model",))
    f = pipelined(layer_fn, mesh, axis="model", n_micro=n_micro)

    want = sequential(params, x)
    got = f(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # gradients flow through the pipeline (autodiff reverses the ppermutes)
    def loss(fn):
        return lambda p, x: jnp.sum(fn(p, x) ** 2)

    g_want = jax.grad(loss(sequential))(params, x)
    g_got = jax.grad(loss(f))(params, x)
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_auto_microbatches_small_batch():
    """Round-4 regression: the 2*stages default produced ZERO-size
    microbatches when the per-shard batch was smaller. Auto (n_micro=None)
    must clamp to the largest divisor of the per-shard batch, and an
    explicit indivisible n_micro must raise a clear error."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(0)
    L, D = 8, 16
    params = {
        "w": jnp.asarray(rng.standard_normal((L, D, D)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((L, D)) * 0.1, jnp.float32),
    }
    # batch < 2*stages (and odd batches): auto picks the largest divisor,
    # output still exact — at both 2 and 4 stages
    for n_stages in (2, 4):
        mesh = Mesh(np.array(jax.devices()[:n_stages]), ("model",))
        f = pipelined(layer_fn, mesh, axis="model", n_micro=None)
        for B in (1, 2, 3, 5):
            x = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(f(params, x)), np.asarray(sequential(params, x)),
                rtol=1e-5, atol=1e-5,
            )
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))

    # explicit n_micro that doesn't divide the batch: loud trace-time error
    x = jnp.asarray(rng.standard_normal((2, D)), jnp.float32)
    bad = pipelined(layer_fn, mesh, axis="model", n_micro=4)
    with pytest.raises(ValueError, match="pipeline_microbatches"):
        bad(params, x)


def test_pipeline_on_eva_vit_blocks():
    """The real EVA ViT block stack runs pipelined (stacked-leaf layout is
    exactly the pipeline's stage format)."""
    from jax.sharding import Mesh

    from mico_tpu.config import EvaVitConfig
    from mico_tpu.models.eva_vit import _block, eva_vit_forward, init_eva_vit

    cfg = EvaVitConfig(image_size=28, patch_size=14, layers=4, width=32,
                       head_width=16, mlp_ratio=4.0, embed_dim=16)
    params = init_eva_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 3, 28, 28)), jnp.float32)
    want = eva_vit_forward(params, cfg, x, return_all_features=True)

    def vit_layer_fn(lp, h):
        def body(h, bp):
            return _block(h, bp, cfg, None, None, "xla"), None

        out, _ = jax.lax.scan(body, h, lp)
        return out

    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("model",))
    run_blocks = pipelined(vit_layer_fn, mesh, axis="model", n_micro=2)

    # reproduce the embed/LN halves around the pipelined trunk
    from mico_tpu.models.eva_vit import patch_embed
    from mico_tpu.ops.layers import layer_norm

    h = patch_embed(params["patch_embed"], cfg, x)
    cls = jnp.broadcast_to(params["cls_token"], (4, 1, cfg.width))
    h = jnp.concatenate([cls, h], axis=1) + params["pos_embed"]
    h = run_blocks(params["blocks"], h)
    got = layer_norm(h, params["norm_w"], params["norm_b"], cfg.ln_eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_eva_vit_forward_pipeline_stages_flag():
    """Runtime wiring (round-2 VERDICT item 7): eva_vit_forward's
    pipeline_stages>1 path — the one cfg.pipeline_stages drives — matches
    the sequential scan under an ambient dp x pp mesh."""
    from mico_tpu.config import EvaVitConfig
    from mico_tpu.models.eva_vit import eva_vit_forward, init_eva_vit
    from mico_tpu.parallel.mesh import create_mesh

    cfg = EvaVitConfig(image_size=28, patch_size=14, layers=4, width=32,
                       head_width=16, mlp_ratio=4.0, embed_dim=16)
    params = init_eva_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 3, 28, 28)), jnp.float32)
    want = eva_vit_forward(params, cfg, x)

    mesh = create_mesh(data=4, model=2)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(
            lambda p, x: eva_vit_forward(
                p, cfg, x, pipeline_stages=2, pipeline_microbatches=2
            )
        )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_train_step_pipeline_equivalence():
    """Full train step with cfg.pipeline_stages=2 over the CPU mesh
    produces the same losses as the unpipelined step (same rng)."""
    from mico_tpu.config import BertConfig, EvaVitConfig, MiCoConfig
    from mico_tpu.models.mico import init_mico
    from mico_tpu.parallel.mesh import create_mesh
    from mico_tpu.train.optim import OptimConfig, build_optimizer
    from mico_tpu.train.train_step import make_train_step, shard_batch

    def mk_cfg(pp):
        return MiCoConfig(
            eva_override=EvaVitConfig(
                image_size=28, patch_size=14, layers=4, width=32,
                head_width=16, mlp_ratio=4.0, embed_dim=16,
            ),
            bert_override=BertConfig(
                vocab_size=200, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=32, encoder_width=32,
            ),
            contra_dim=16, max_vision_sample_num=2,
            compute_dtype="float32", use_flash_attention=False,
            pipeline_stages=pp,
        )

    rng = np.random.default_rng(0)
    b = 8
    batch = {
        "vision_pixels": jnp.asarray(
            rng.standard_normal((b, 2, 3, 28, 28)), jnp.float32
        ),
        "caption_ids": jnp.asarray(rng.integers(5, 200, (b, 10)), jnp.int32),
        "caption_mask": jnp.ones((b, 10), jnp.int32),
    }

    cfg0, cfg2 = mk_cfg(1), mk_cfg(2)
    params = init_mico(jax.random.PRNGKey(0), cfg0)
    opt = build_optimizer(params, OptimConfig(num_train_steps=10))
    opt_state = opt.init(params)

    mesh = create_mesh(data=4, model=2)
    key = jax.random.PRNGKey(3)
    with jax.sharding.set_mesh(mesh):
        sb = shard_batch(mesh, batch)
        _, _, l0 = make_train_step(cfg0, opt, "cap%tv", donate=False)(
            params, opt_state, sb, key
        )
        _, _, l2 = make_train_step(cfg2, opt, "cap%tv", donate=False)(
            params, opt_state, sb, key
        )
    for k in l0:
        np.testing.assert_allclose(
            float(l2[k]), float(l0[k]), rtol=2e-5, atol=2e-6
        )
