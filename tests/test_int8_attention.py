"""Dequant-fused int8 cross-K/V decode (VERDICT r2 item 5).

Gates: kernel==XLA-reference exact (interpret mode), quantization error
bounded per row-head, and high token agreement between int8 and bf16/f32
decode on the cached paths."""

import jax
import jax.numpy as jnp
import numpy as np

from mico_tpu.config import BertConfig
from mico_tpu.models.bert import init_bert
from mico_tpu.ops import int8_attention as i8

CFG = BertConfig(
    vocab_size=130,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    max_position_embeddings=64,
    encoder_width=32,
)


def test_quantize_kv_error_bound(rng):
    x = jnp.asarray(rng.standard_normal((2, 9, 32)) * 3.0, jnp.float32)
    x8, s = i8.quantize_kv(x, num_heads=4)
    assert x8.dtype == jnp.int8 and s.shape == (2, 9, 4)
    deq = (
        x8.astype(jnp.float32).reshape(2, 9, 4, 8) * s[..., None]
    ).reshape(2, 9, 32)
    err = np.abs(np.asarray(deq - x))
    bound = np.asarray(s).repeat(8, -1).reshape(2, 9, 32) * 0.5 + 1e-6
    assert (err <= bound).all()


def test_kernel_matches_reference_interpret(rng):
    q = jnp.asarray(rng.standard_normal((3, 6, 32)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((3, 17, 32)), jnp.float32)
    k8, ks = i8.quantize_kv(kv, 4)
    v8, vs = i8.quantize_kv(kv[:, ::-1], 4)
    want = i8._int8_cross_reference(q, k8, ks, v8, vs, 4, 8**-0.5)
    got = i8._int8_cross_call(q, k8, ks, v8, vs, 4, 8**-0.5, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def _params():
    return init_bert(jax.random.PRNGKey(3), CFG)


def test_int8_decode_token_agreement(rng):
    from mico_tpu.generation import cached_beam_generate, cached_generate

    params = _params()
    cond = jnp.asarray(rng.standard_normal((8, 7, 32)), jnp.float32)
    base = np.asarray(
        cached_generate(params, CFG, cond, max_new_tokens=10, mode="greedy")
    )
    got = np.asarray(
        cached_generate(params, CFG, cond, max_new_tokens=10, mode="greedy",
                        int8_cross_kv=True)
    )
    agree = float((base == got).mean())
    assert agree >= 0.95, agree

    base_b = np.asarray(
        cached_beam_generate(params, CFG, cond, max_new_tokens=8, num_beams=3)
    )
    got_b = np.asarray(
        cached_beam_generate(params, CFG, cond, max_new_tokens=8, num_beams=3,
                             int8_cross_kv=True)
    )
    agree_b = float((base_b == got_b).mean())
    assert agree_b >= 0.9, agree_b


def test_int8_qa_decode_runs(rng):
    from mico_tpu.generation import generate_answers

    params = _params()
    cond = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    q_ids = jnp.asarray(
        np.array([[101, 7, 8, 102, 0], [101, 9, 102, 0, 0]]), jnp.int32
    )
    q_mask = jnp.asarray(
        np.array([[1, 1, 1, 1, 0], [1, 1, 1, 0, 0]]), jnp.int32
    )
    for mode in ("greedy", "beam"):
        out = np.asarray(
            generate_answers(params, CFG, q_ids, q_mask, cond,
                             max_new_tokens=5, mode=mode,
                             int8_cross_kv=True)
        )
        assert out.shape == (2, 6) and (out[:, 0] == 101).all()
