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
