"""Flash attention kernel (interpret mode on CPU) vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mico_tpu.ops.attention import xla_attention
from mico_tpu.ops.flash_attention import flash_attention


def _mk(rng, b, h, lq, lk, d, dtype=np.float32):
    q = rng.standard_normal((b, h, lq, d)).astype(dtype)
    k = rng.standard_normal((b, h, lk, d)).astype(dtype)
    v = rng.standard_normal((b, h, lk, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize(
    "b,h,lq,lk,d",
    [
        (2, 4, 257, 257, 88),   # EVA self-attn (non-aligned seq + head dim)
        (2, 2, 30, 1028, 64),   # BERT cross-attn over 4x257 vision tokens
        (1, 2, 128, 128, 128),  # aligned
        (1, 1, 7, 5, 32),       # tiny ragged
    ],
)
def test_flash_matches_xla(rng, b, h, lq, lk, d):
    q, k, v = _mk(rng, b, h, lq, lk, d)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_with_padding_mask(rng):
    b, h, lq, lk, d = 2, 2, 16, 64, 32
    q, k, v = _mk(rng, b, h, lq, lk, d)
    mask = (rng.uniform(size=(b, lk)) > 0.3).astype(np.float32)
    mask[:, :4] = 1.0
    bias = jnp.asarray((1.0 - mask) * -10000.0)[:, None, None, :]
    want = xla_attention(q, k, v, bias=bias)
    got = flash_attention(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_with_3d_mask(rng):
    # causal-style 3D mask as used by caption generation (b, Lq, Lk)
    b, h, l, d = 2, 3, 33, 64
    q, k, v = _mk(rng, b, h, l, l, d)
    causal = np.tril(np.ones((l, l), np.float32))
    bias = jnp.asarray((1.0 - causal) * -10000.0)[None, None]
    want = xla_attention(q, k, v, bias=bias)
    got = flash_attention(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_bf16(rng):
    b, h, l, d = 1, 2, 257, 88
    q, k, v = _mk(rng, b, h, l, l, d)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = np.asarray(xla_attention(q, k, v), dtype=np.float32)
    got = np.asarray(flash_attention(q, k, v, interpret=True), dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize(
    "b,h,lq,lk,d",
    [
        (1, 2, 128, 16384, 64),   # 16k context (past MAX_RESIDENT_KV=8192)
        (1, 1, 64, 9000, 88),     # ragged KV tail + EVA head dim
        (2, 2, 30, 8224, 64),     # 32-frame (32x257) BERT cross-attn context
    ],
)
def test_flash_kv_tiled_matches_xla(rng, b, h, lq, lk, d):
    from mico_tpu.ops.flash_attention import _flash_kv_tiled

    q, k, v = _mk(rng, b, h, lq, lk, d)
    want = xla_attention(q, k, v)
    got = _flash_kv_tiled(q, k, v, None, float(d) ** -0.5, 128, 1024, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # the public entry dispatches to the tiled kernel past the cliff
    got2 = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_flash_kv_tiled_with_padding_mask(rng):
    b, h, lq, lk, d = 2, 2, 16, 8960, 32
    q, k, v = _mk(rng, b, h, lq, lk, d)
    mask = (rng.uniform(size=(b, lk)) > 0.3).astype(np.float32)
    mask[:, :4] = 1.0
    bias = jnp.asarray((1.0 - mask) * -10000.0)[:, None, None, :]
    want = xla_attention(q, k, v, bias=bias)
    got = flash_attention(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_packed_self_attention_kernel(rng):
    # the packed encoder hot path: (B, L, H*D) projection-layout rows; the
    # actual Mosaic kernel runs here via interpret mode
    from mico_tpu.ops.flash_attention import _packed_fwd, _packed_reference

    b, l, nh, d = 2, 257, 4, 88
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, l, nh * d)), jnp.float32)
        for _ in range(3)
    )
    want = _packed_reference(q, k, v, nh, d**-0.5)
    got = _packed_fwd(q, k, v, nh, d**-0.5, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_packed_self_attention_grads(rng):
    from mico_tpu.ops.flash_attention import (
        _packed_reference,
        packed_self_attention,
    )

    b, l, nh, d = 2, 33, 4, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, l, nh * d)), jnp.float32)
        for _ in range(3)
    )

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v, nh, d**-0.5) ** 2)

    got = jax.grad(loss(packed_self_attention), argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss(_packed_reference), argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5
        )


def test_packed_bwd_pallas_kernel(rng):
    """The Pallas backward kernels themselves (interpret mode) vs the XLA
    vjp of the identical-math reference."""
    from mico_tpu.ops.flash_attention import (
        _packed_bwd,
        _packed_qkv_bwd,
        _packed_qkv_reference,
        _packed_reference,
    )

    b, l, nh, d = 2, 257, 4, 88
    scale = d**-0.5
    q, k, v, g = (
        jnp.asarray(rng.standard_normal((b, l, nh * d)), jnp.float32)
        for _ in range(4)
    )
    _, vjp = jax.vjp(lambda q, k, v: _packed_reference(q, k, v, nh, scale),
                     q, k, v)
    want = vjp(g)
    got = _packed_bwd(q, k, v, g, nh, scale, True)
    for gi, wi in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(gi), np.asarray(wi), rtol=2e-4, atol=2e-4
        )

    qkv = jnp.concatenate([q, k, v], axis=-1)
    _, vjp2 = jax.vjp(lambda t: _packed_qkv_reference(t, nh, scale), qkv)
    (want2,) = vjp2(g)
    got2 = _packed_qkv_bwd(qkv, g, nh, scale, True)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want2), rtol=2e-4, atol=2e-4
    )


def test_packed_qkv_kernel(rng):
    from mico_tpu.ops.flash_attention import (
        _packed_qkv_fwd,
        _packed_qkv_reference,
        packed_qkv_self_attention,
    )

    b, l, nh, d = 2, 257, 4, 88
    qkv = jnp.asarray(
        rng.standard_normal((b, l, 3 * nh * d)), jnp.float32
    )
    want = _packed_qkv_reference(qkv, nh, d**-0.5)
    got = _packed_qkv_fwd(qkv, nh, d**-0.5, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

    def loss(fn):
        return lambda t: jnp.sum(fn(t, nh, d**-0.5) ** 2)

    g1 = jax.grad(loss(packed_qkv_self_attention))(qkv)
    g2 = jax.grad(loss(_packed_qkv_reference))(qkv)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )


def test_kv_tiled_stats_forward_matches(rng):
    """The LSE-emitting forward returns the same o as the plain KV-tiled
    kernel, and its LSE reproduces the softmax normalizer."""
    from mico_tpu.ops.flash_attention import (
        _flash_kv_tiled,
        _flash_kv_tiled_stats,
    )

    b, h, lq, lk, d = 1, 2, 96, 300, 32
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    scale = float(d) ** -0.5
    want = _flash_kv_tiled(q, k, v, None, scale, 32, 128, True)
    got, lse = _flash_kv_tiled_stats(q, k, v, None, scale, 32, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * scale
    want_lse = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    np.testing.assert_allclose(np.asarray(lse)[..., 0], want_lse,
                               rtol=1e-5, atol=1e-5)


def test_kv_tiled_pallas_backward_exact(rng):
    """Pallas KV-tiled backward == XLA attention grads, including ragged
    q/k tails (round-2 VERDICT missing #4)."""
    from mico_tpu.ops.attention import xla_attention
    from mico_tpu.ops.flash_attention import (
        _flash_kv_tiled_bwd,
        _flash_kv_tiled_stats,
    )

    b, h, lq, lk, d = 1, 2, 100, 290, 32   # non-multiples of 32/128 tiles
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    scale = float(d) ** -0.5

    _, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v, scale=scale),
                     q, k, v)
    want_dq, want_dk, want_dv = vjp(g)

    out, lse = _flash_kv_tiled_stats(q, k, v, None, scale, 32, 128, True)
    delta = jnp.sum(g * out, axis=-1, keepdims=True)
    dq, dk, dv = _flash_kv_tiled_bwd(q, k, v, g, lse, delta, scale,
                                     32, 128, True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(want_dq),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(want_dk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(want_dv),
                               rtol=2e-4, atol=2e-4)


def test_long_context_grad_routes_through_pallas_bwd(rng):
    """End-to-end: jax.grad through flash_attention at a past-resident-KV
    shape equals the XLA reference grads (the custom_vjp now routes the
    long-context backward to the Pallas kernels)."""
    from mico_tpu.ops.attention import xla_attention
    from mico_tpu.ops.flash_attention import flash_attention

    b, h, lq, lk, d = 1, 1, 160, 8256, 32   # lk > MAX_RESIDENT_KV
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)) * 0.2, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)) * 0.2, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)) * 0.2, jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(
            flash_attention(q, k, v, block_q=64, block_k=512,
                            interpret=True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.square(xla_attention(q, k, v)))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4)


def test_packed_qkv_cls_split_matches_general(rng):
    """The CLS-split packed kernel (L = 128k+1 route) is exact vs the
    general packed kernel and the XLA reference."""
    from mico_tpu.ops import flash_attention as fa

    b, l, nh, d = 2, 257, 4, 88
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * nh * d)), jnp.float32)
    want = fa._packed_qkv_reference(qkv, nh, d**-0.5)
    got_general = fa._packed_qkv_fwd(qkv, nh, d**-0.5, True)
    try:
        fa.PACKED_CLS_SPLIT = True
        fa._packed_qkv_fwd.clear_cache()
        got_split = fa._packed_qkv_fwd(qkv, nh, d**-0.5, True)
    finally:
        fa.PACKED_CLS_SPLIT = False
        fa._packed_qkv_fwd.clear_cache()
    np.testing.assert_allclose(np.asarray(got_split), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_general), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_qkv_proj_kernel(rng):
    """The projection-fused kernel (interpret mode) == the XLA composition
    (qkv matmul then packed attention), forward and grads (x, W, bias)."""
    from mico_tpu.ops.flash_attention import (
        _fused_qkv_attn_fwd,
        _fused_qkv_reference,
        fused_qkv_self_attention,
    )

    b, l, nh, d = 2, 257, 4, 88
    w_dim = nh * d
    x = jnp.asarray(rng.standard_normal((b, l, w_dim)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((w_dim, 3 * w_dim)) * 0.05, jnp.float32
    )
    bias = jnp.asarray(rng.standard_normal(3 * w_dim) * 0.05, jnp.float32)
    scale = d**-0.5
    want = _fused_qkv_reference(x, w, bias, nh, scale)
    got = _fused_qkv_attn_fwd(x, w, bias, nh, scale, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

    def loss(fn):
        return lambda x, w, b: jnp.sum(fn(x, w, b, nh, scale) ** 2)

    g1 = jax.grad(loss(fused_qkv_self_attention), argnums=(0, 1, 2))(
        x, w, bias
    )
    g2 = jax.grad(loss(_fused_qkv_reference), argnums=(0, 1, 2))(x, w, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        )


def test_fused_qkv_proj_route_in_eva(rng):
    """FUSED_QKV_PROJ=True routes the ViT block through the fused op with
    identical outputs to the default path (CPU: both take the XLA
    reference composition — the routing itself is what's under test)."""
    from mico_tpu.config import EvaVitConfig
    from mico_tpu.models.eva_vit import eva_vit_forward, init_eva_vit
    from mico_tpu.ops import flash_attention as fa

    cfg = EvaVitConfig(
        image_size=28, patch_size=14, layers=2, width=64, head_width=32,
        embed_dim=64,
    )
    params = init_eva_vit(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(rng.standard_normal((2, 3, 28, 28)), jnp.float32)
    want = eva_vit_forward(params, cfg, pixels)
    old = fa.FUSED_QKV_PROJ
    try:
        fa.FUSED_QKV_PROJ = True
        got = eva_vit_forward(params, cfg, pixels)
    finally:
        fa.FUSED_QKV_PROJ = old
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_kv_tiled_biased_pallas_backward_exact(rng):
    """The BIASED KV-tiled Pallas backward (round-3 VERDICT next #5):
    q/k/v grads == XLA attention grads with the same additive mask,
    including ragged q/k tails, for both a padding mask (b, 1, 1, Lk) and
    a full per-row bias (b, h, Lq, Lk)."""
    from mico_tpu.ops.attention import xla_attention
    from mico_tpu.ops.flash_attention import (
        _flash_kv_tiled_bwd,
        _flash_kv_tiled_stats,
    )

    b, h, lq, lk, d = 1, 2, 100, 290, 32   # non-multiples of 32/128 tiles
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    scale = float(d) ** -0.5

    mask = (rng.uniform(size=(b, lk)) > 0.3).astype(np.float32)
    mask[:, :4] = 1.0
    pad_bias = jnp.asarray((1.0 - mask) * -10000.0)[:, None, None, :]
    full_bias = jnp.asarray(
        rng.standard_normal((b, h, lq, lk)), jnp.float32
    )
    for bias in (pad_bias, full_bias):
        _, vjp = jax.vjp(
            lambda q, k, v: xla_attention(q, k, v, bias=bias, scale=scale),
            q, k, v,
        )
        want_dq, want_dk, want_dv = vjp(g)
        out, lse = _flash_kv_tiled_stats(q, k, v, bias, scale, 32, 128, True)
        delta = jnp.sum(g * out, axis=-1, keepdims=True)
        dq, dk, dv = _flash_kv_tiled_bwd(q, k, v, g, lse, delta, scale,
                                         32, 128, True, bias=bias)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(want_dq),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(want_dk),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(want_dv),
                                   rtol=2e-4, atol=2e-4)


def test_long_context_biased_grad_routes_through_pallas_bwd(rng):
    """End-to-end: jax.grad through flash_attention WITH a padding mask at
    a past-resident-KV shape equals the XLA reference q/k/v grads — the
    biased route now takes the Pallas stats-fwd + flash backward under the
    KV_TILED_BIAS_IS_MASK contract (bias cotangent is zero there)."""
    from mico_tpu.ops.attention import xla_attention
    from mico_tpu.ops import flash_attention as fa

    b, h, lq, lk, d = 1, 1, 160, 8256, 32   # lk > MAX_RESIDENT_KV
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)) * 0.2, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)) * 0.2, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)) * 0.2, jnp.float32)
    mask = (rng.uniform(size=(b, lk)) > 0.2).astype(np.float32)
    mask[:, :8] = 1.0
    bias = jnp.asarray((1.0 - mask) * -10000.0)[:, None, None, :]

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(
            fa.flash_attention(q, k, v, bias=bias, block_q=64, block_k=512,
                               interpret=True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.square(xla_attention(q, k, v, bias=bias)))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4)
    # the mask's own cotangent is zero by contract on this route
    db = jax.grad(
        lambda bb: jnp.sum(fa.flash_attention(
            q, k, v, bias=bb, block_q=64, block_k=512, interpret=True))
    )(bias)
    assert float(jnp.abs(db).max()) == 0.0


def test_fused_qkv_attn_proj_kernel(rng):
    """The doubly-fused kernel (qkv + out-projection in-kernel, interpret
    mode) == the XLA composition, forward and all five grads."""
    from mico_tpu.ops.flash_attention import (
        _fused_qkv_attn_proj_fwd,
        _fused_qkv_attn_proj_reference,
        fused_qkv_attn_proj,
    )

    b, l, nh, d = 2, 257, 4, 88
    w_dim = nh * d
    x = jnp.asarray(rng.standard_normal((b, l, w_dim)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((w_dim, 3 * w_dim)) * 0.05, jnp.float32
    )
    bias = jnp.asarray(rng.standard_normal(3 * w_dim) * 0.05, jnp.float32)
    wp = jnp.asarray(
        rng.standard_normal((w_dim, w_dim)) * 0.05, jnp.float32
    )
    bp = jnp.asarray(rng.standard_normal(w_dim) * 0.05, jnp.float32)
    scale = d**-0.5
    want = _fused_qkv_attn_proj_reference(x, w, bias, wp, bp, nh, scale)
    got = _fused_qkv_attn_proj_fwd(x, w, bias, wp, bp, nh, scale, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a, nh, scale) ** 2)

    g1 = jax.grad(loss(fused_qkv_attn_proj), argnums=(0, 1, 2, 3, 4))(
        x, w, bias, wp, bp
    )
    g2 = jax.grad(
        loss(_fused_qkv_attn_proj_reference), argnums=(0, 1, 2, 3, 4)
    )(x, w, bias, wp, bp)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        )


def test_fused_ln_qkv_kernel(rng):
    """LN-fused kernel (interpret) == layer_norm → qkv → packed attention
    composition, forward and grads, affine and affine-free."""
    from mico_tpu.ops.flash_attention import (
        _fused_ln_qkv_attn_fwd,
        _fused_ln_qkv_reference,
        fused_ln_qkv_self_attention,
    )

    b, l, nh, d = 2, 257, 4, 88
    w_dim = nh * d
    x = jnp.asarray(rng.standard_normal((b, l, w_dim)), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(w_dim), jnp.float32)
    b0 = jnp.asarray(0.1 * rng.standard_normal(w_dim), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((w_dim, 3 * w_dim)) * 0.05, jnp.float32
    )
    bias = jnp.asarray(rng.standard_normal(3 * w_dim) * 0.05, jnp.float32)
    scale, eps = d**-0.5, 1e-6
    for affine in (True, False):
        want = _fused_ln_qkv_reference(x, g, b0, w, bias, nh, scale, eps,
                                       affine)
        got = _fused_ln_qkv_attn_fwd(x, g, b0, w, bias, nh, scale, eps,
                                     affine, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a, nh, scale, eps, True) ** 2)

    g1 = jax.grad(loss(fused_ln_qkv_self_attention),
                  argnums=(0, 1, 2, 3, 4))(x, g, b0, w, bias)
    g2 = jax.grad(loss(_fused_ln_qkv_reference),
                  argnums=(0, 1, 2, 3, 4))(x, g, b0, w, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        )


def test_fused_ln_qkv_route_in_eva(rng):
    """FUSED_LN_QKV=True routes the pre-norm ViT block through the
    LN-fused op with outputs matching the default path."""
    from mico_tpu.config import EvaVitConfig
    from mico_tpu.models.eva_vit import eva_vit_forward, init_eva_vit
    from mico_tpu.ops import flash_attention as fa

    cfg = EvaVitConfig(
        image_size=28, patch_size=14, layers=2, width=64, head_width=32,
        embed_dim=64,
    )
    params = init_eva_vit(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(rng.standard_normal((2, 3, 28, 28)), jnp.float32)
    want = eva_vit_forward(params, cfg, pixels)
    old = fa.FUSED_LN_QKV
    try:
        fa.FUSED_LN_QKV = True
        got = eva_vit_forward(params, cfg, pixels)
    finally:
        fa.FUSED_LN_QKV = old
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )
