"""Generation parity: our fixed-shape decode vs a literal transcription of the
reference [MASK]-append decoding loop (model/bert.py:1110-1143) running the
reference PyTorch model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mico_tpu.config import BertConfig
from mico_tpu.convert import bert_from_torch
from mico_tpu.generation import generate

from reference_loader import load_bert_module

CFG = BertConfig(
    vocab_size=130,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    max_position_embeddings=64,
    encoder_width=32,
)
CLS, SEP, PAD, MASK = 101, 102, 0, 103


@pytest.fixture(scope="module")
def ref_model():
    mod = load_bert_module()
    from transformers.models.bert.configuration_bert import BertConfig as HFConfig

    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        intermediate_size=CFG.intermediate_size,
        max_position_embeddings=CFG.max_position_embeddings,
        add_cross_attention=True,
        is_decoder=True,
    )
    model = mod.BertForMaskedLM(hf_cfg)
    model.eval()
    g = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


def reference_greedy_decode(model, cond, max_new):
    """Literal reference semantics: per-step [MASK] append + 3D mask growth
    (update_attention_mask copies the previous row and self-attends)."""
    b = cond.shape[0]
    input_ids = torch.full((b, 1), CLS, dtype=torch.long)
    attn = torch.ones(b, 1, 1)
    finished = torch.zeros(b, dtype=torch.bool)
    for _ in range(max_new):
        # update_attention_mask (model/bert.py:1110-1117)
        n = attn.shape[1]
        new = attn.new_zeros(b, n + 1, n + 1)
        new[:, :n, :n] = attn
        new[:, n, :n] = attn[:, n - 1, :]
        new[:, n, n] = 1
        attn = new
        probe = torch.cat(
            [input_ids, torch.full((b, 1), MASK, dtype=torch.long)], dim=1
        )
        with torch.no_grad():
            logits = model(
                input_ids=probe,
                attention_mask=attn,
                encoder_hidden_states=torch.from_numpy(cond),
            ).logits
        nxt = logits[:, -1].argmax(-1)
        nxt = torch.where(finished, torch.tensor(PAD), nxt)
        input_ids = torch.cat([input_ids, nxt[:, None]], dim=1)
        finished |= nxt == SEP
    return input_ids.numpy()


@pytest.fixture(scope="module")
def setup(ref_model):
    rng = np.random.default_rng(2)
    cond = rng.standard_normal((2, 7, CFG.encoder_width)).astype(np.float32)
    params = bert_from_torch(ref_model.state_dict(), CFG)
    return ref_model, cond, params


def test_greedy_matches_reference_loop(setup):
    ref_model, cond, params = setup
    want = reference_greedy_decode(ref_model, cond, max_new=12)
    got = np.asarray(
        generate(
            params, CFG, jnp.asarray(cond), max_new_tokens=12, mode="greedy"
        )
    )
    np.testing.assert_array_equal(got, want)


def test_sample_contract(setup):
    _, cond, params = setup
    out = np.asarray(
        generate(
            params, CFG, jnp.asarray(cond), max_new_tokens=10, mode="sample",
            top_k=5, rng=jax.random.PRNGKey(7),
        )
    )
    assert out.shape == (2, 11)
    assert (out[:, 0] == CLS).all()
    # after SEP, only PAD
    for row in out:
        seps = np.nonzero(row == SEP)[0]
        if len(seps):
            assert (row[seps[0] + 1 :] == PAD).all()


def _sequence_logprob(model, seq, cond):
    """Score a generated sequence under the reference model with the same
    causal convention used during decoding."""
    total = 0.0
    b = 1
    input_ids = torch.full((b, 1), CLS, dtype=torch.long)
    attn = torch.ones(b, 1, 1)
    for tok in seq:
        if tok == PAD:
            break
        n = attn.shape[1]
        new = attn.new_zeros(b, n + 1, n + 1)
        new[:, :n, :n] = attn
        new[:, n, :n] = attn[:, n - 1, :]
        new[:, n, n] = 1
        attn = new
        probe = torch.cat(
            [input_ids, torch.full((b, 1), MASK, dtype=torch.long)], dim=1
        )
        with torch.no_grad():
            logits = model(
                input_ids=probe,
                attention_mask=attn,
                encoder_hidden_states=torch.from_numpy(cond),
            ).logits
        logp = torch.log_softmax(logits[0, -1].float(), dim=-1)
        total += float(logp[tok])
        input_ids = torch.cat(
            [input_ids, torch.tensor([[tok]], dtype=torch.long)], dim=1
        )
        if tok == SEP:
            break
    return total


def test_beam_not_worse_than_greedy(setup):
    ref_model, cond, params = setup
    greedy = np.asarray(
        generate(params, CFG, jnp.asarray(cond), max_new_tokens=8, mode="greedy")
    )
    beam = np.asarray(
        generate(
            params, CFG, jnp.asarray(cond), max_new_tokens=8, mode="beam",
            num_beams=3, length_penalty=0.0,
        )
    )
    assert beam.shape == (2, 9)
    for i in range(2):
        sg = _sequence_logprob(ref_model, greedy[i, 1:], cond[i : i + 1])
        sb = _sequence_logprob(ref_model, beam[i, 1:], cond[i : i + 1])
        assert sb >= sg - 1e-4


def test_scst_sampling(setup):
    """generate_scst: grad-enabled multinomial decode returning per-step
    logP of the sampled tokens (reference model/bert.py:1231,1452-1456)."""
    from mico_tpu.generation import generate_scst

    _, cond, params = setup
    cond_j = jnp.asarray(cond)
    tokens, logp = generate_scst(
        params, CFG, cond_j, max_new_tokens=8, rng=jax.random.PRNGKey(3)
    )
    assert tokens.shape == (2, 9) and logp.shape == (2, 8)
    assert (tokens[:, 0] == CLS).all()
    # logP of a sampled token is a valid log-probability
    assert (np.asarray(logp) <= 0).all()
    # after [SEP], tokens are PAD and logp contributions are zeroed
    toks = np.asarray(tokens)
    lp = np.asarray(logp)
    for b in range(toks.shape[0]):
        sep = np.where(toks[b] == SEP)[0]
        if sep.size:
            assert (toks[b, sep[0] + 1:] == PAD).all()
            assert (lp[b, sep[0]:] == 0).all()

    # REINFORCE gradient flows into the decoder parameters
    def loss(params):
        _, lp = generate_scst(
            params, CFG, cond_j, max_new_tokens=4, rng=jax.random.PRNGKey(3)
        )
        return -jnp.sum(lp)

    g = jax.grad(loss)(params)
    gnorm = sum(
        float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_cached_generate_matches_recompute(setup):
    """KV-cached incremental decode == the recompute [MASK]-append decode,
    token for token (greedy, fp32)."""
    from mico_tpu.generation import cached_generate

    _, cond, params = setup
    cond_j = jnp.asarray(cond)
    want = np.asarray(
        generate(params, CFG, cond_j, max_new_tokens=12, mode="greedy",
                 use_cache=False)
    )
    got = np.asarray(
        cached_generate(params, CFG, cond_j, max_new_tokens=12, mode="greedy")
    )
    np.testing.assert_array_equal(got, want)


def test_cached_sampling_matches_recompute(setup):
    """Same rng stream → identical sampled tokens on both paths."""
    from mico_tpu.generation import cached_generate

    _, cond, params = setup
    cond_j = jnp.asarray(cond)
    want = np.asarray(
        generate(params, CFG, cond_j, max_new_tokens=10, mode="sample",
                 top_k=5, rng=jax.random.PRNGKey(7), use_cache=False)
    )
    got = np.asarray(
        cached_generate(params, CFG, cond_j, max_new_tokens=10, mode="sample",
                        top_k=5, rng=jax.random.PRNGKey(7))
    )
    np.testing.assert_array_equal(got, want)


def test_cached_beam_matches_recompute(setup):
    from mico_tpu.generation import cached_beam_generate

    _, cond, params = setup
    cond_j = jnp.asarray(cond)
    want = np.asarray(
        generate(params, CFG, cond_j, max_new_tokens=10, mode="beam",
                 num_beams=3, use_cache=False)
    )
    got = np.asarray(
        cached_beam_generate(params, CFG, cond_j, max_new_tokens=10,
                             num_beams=3)
    )
    np.testing.assert_array_equal(got, want)


def test_cached_qa_matches_recompute(setup):
    """Prefix-prefilled cached QA decode == the recompute part-causal decode
    token for token, including padded question positions."""
    from mico_tpu.generation import generate_answers

    _, cond, params = setup
    cond_j = jnp.asarray(cond)
    rng = np.random.default_rng(4)
    q_ids = np.zeros((2, 9), np.int64)
    q_mask = np.zeros((2, 9), np.int64)
    for i, n in enumerate((9, 5)):    # one full, one padded question
        q_ids[i, 0] = CLS
        q_ids[i, 1 : n - 1] = rng.integers(4, 100, (n - 2,))
        q_ids[i, n - 1] = SEP
        q_mask[i, :n] = 1
    q_ids = jnp.asarray(q_ids)
    q_mask = jnp.asarray(q_mask)
    want = np.asarray(
        generate_answers(params, CFG, q_ids, q_mask, cond_j,
                         max_new_tokens=8, mode="greedy", use_cache=False)
    )
    got = np.asarray(
        generate_answers(params, CFG, q_ids, q_mask, cond_j,
                         max_new_tokens=8, mode="greedy", use_cache=True)
    )
    np.testing.assert_array_equal(got, want)


def test_scst_cached_matches_recompute(setup):
    from mico_tpu.generation import generate_scst

    _, cond, params = setup
    cond_j = jnp.asarray(cond)
    t1, l1 = generate_scst(params, CFG, cond_j, max_new_tokens=6,
                           rng=jax.random.PRNGKey(9))
    t2, l2 = generate_scst(params, CFG, cond_j, max_new_tokens=6,
                           rng=jax.random.PRNGKey(9), use_cache=True)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-6)


def test_cached_qa_beam_matches_recompute(setup):
    from mico_tpu.generation import generate_answers

    _, cond, params = setup
    cond_j = jnp.asarray(cond)
    rng = np.random.default_rng(6)
    q_ids = np.zeros((2, 7), np.int64)
    q_mask = np.zeros((2, 7), np.int64)
    for i, n in enumerate((7, 4)):
        q_ids[i, 0] = CLS
        q_ids[i, 1 : n - 1] = rng.integers(4, 100, (n - 2,))
        q_ids[i, n - 1] = SEP
        q_mask[i, :n] = 1
    q_ids, q_mask = jnp.asarray(q_ids), jnp.asarray(q_mask)
    want = np.asarray(
        generate_answers(params, CFG, q_ids, q_mask, cond_j,
                         max_new_tokens=6, mode="beam", num_beams=3,
                         use_cache=False)
    )
    got = np.asarray(
        generate_answers(params, CFG, q_ids, q_mask, cond_j,
                         max_new_tokens=6, mode="beam", num_beams=3,
                         use_cache=True)
    )
    np.testing.assert_array_equal(got, want)
