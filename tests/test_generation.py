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


class _BeamHyps426:
    """Literal transcription of transformers-4.26 BeamHypotheses — the beam
    container the reference's generate() call used (model/bert.py inherits
    GenerationMixin; inference_demo.py:164-171 passes num_beams +
    length_penalty=0.6). Penalty runs over the FULL hypothesis length
    (hyp.shape[-1], prompt included, EOS excluded) — the pre-4.38
    convention."""

    def __init__(self, num_beams, length_penalty):
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.beams = []
        self.worst_score = 1e9

    def add(self, hyp, sum_logprobs):
        score = sum_logprobs / (hyp.shape[-1] ** self.length_penalty)
        if len(self.beams) < self.num_beams or score > self.worst_score:
            self.beams.append((score, hyp))
            if len(self.beams) > self.num_beams:
                srt = sorted((s, i) for i, (s, _) in enumerate(self.beams))
                del self.beams[srt[0][1]]
                self.worst_score = srt[1][0]
            else:
                self.worst_score = min(score, self.worst_score)

    def is_done(self, best_sum_logprobs, cur_len):
        if len(self.beams) < self.num_beams:
            return False
        return (
            self.worst_score
            >= best_sum_logprobs / cur_len**self.length_penalty
        )


def reference_beam_decode(model, cond, max_new, num_beams, length_penalty,
                          q_ids=None, q_mask=None):
    """Transcription of the transformers-4.26 beam_search loop driving the
    reference model's own prepare_inputs_for_generation /
    update_attention_mask hooks (model/bert.py:1110-1143) — [MASK]-append
    probe, 3D mask growth, BeamSearchScorer process/finalize semantics
    (EOS finalized only from ranks < num_beams; finalize appends the EOS
    when it fits; full-length penalty)."""
    import types

    model.tokenizer = types.SimpleNamespace(mask_token_id=MASK)
    cond_t = torch.from_numpy(cond)
    b = cond_t.shape[0]
    k = num_beams
    if q_ids is None:
        input_ids = torch.full((b, 1), CLS, dtype=torch.long)
        attn = torch.ones(b, 1, 1)
    else:
        cls_col = torch.full((b, 1), CLS, dtype=torch.long)
        input_ids = torch.cat([q_ids, cls_col], dim=1)
        n = q_ids.shape[1]
        attn = (
            q_mask[:, None, :].expand(b, n, n).clone().float()
        )
        attn = model.update_attention_mask(attn)
    p_len = input_ids.shape[1]
    max_length = p_len + max_new
    vocab = model.config.vocab_size

    input_ids = input_ids.repeat_interleave(k, dim=0)
    attn = attn.repeat_interleave(k, dim=0)
    cond_r = cond_t.repeat_interleave(k, dim=0)

    beam_scores = torch.zeros(b, k)
    beam_scores[:, 1:] = -1e9
    beam_scores = beam_scores.view(-1)
    hyps = [_BeamHyps426(k, length_penalty) for _ in range(b)]
    done = [False] * b

    while input_ids.shape[1] < max_length and not all(done):
        inputs = model.prepare_inputs_for_generation(
            input_ids, attention_mask=attn, encoder_hidden_states=cond_r
        )
        with torch.no_grad():
            logits = model(
                input_ids=inputs["input_ids"],
                attention_mask=inputs["attention_mask"],
                encoder_hidden_states=inputs["encoder_hidden_states"],
            ).logits[:, -1, :]
        scores = torch.log_softmax(logits.float(), dim=-1)
        next_scores = scores + beam_scores[:, None]
        next_scores = next_scores.view(b, k * vocab)
        next_scores, next_tokens = torch.topk(next_scores, 2 * k, dim=1)
        next_idx = torch.div(next_tokens, vocab, rounding_mode="floor")
        next_tok = next_tokens % vocab

        cur_len = input_ids.shape[1]
        nb_scores = torch.zeros(b, k)
        nb_tokens = torch.zeros(b, k, dtype=torch.long)
        nb_indices = torch.zeros(b, k, dtype=torch.long)
        for i in range(b):
            if done[i]:
                nb_scores[i] = 0
                nb_tokens[i] = PAD
                nb_indices[i] = 0
                continue
            slot = 0
            for rank in range(2 * k):
                tok = int(next_tok[i, rank])
                row = i * k + int(next_idx[i, rank])
                if tok == SEP:
                    if rank >= k:
                        continue
                    hyps[i].add(
                        input_ids[row].clone(), float(next_scores[i, rank])
                    )
                else:
                    nb_scores[i, slot] = next_scores[i, rank]
                    nb_tokens[i, slot] = tok
                    nb_indices[i, slot] = row
                    slot += 1
                if slot == k:
                    break
            done[i] = done[i] or hyps[i].is_done(
                float(next_scores[i].max()), cur_len
            )
        beam_scores = nb_scores.view(-1)
        input_ids = torch.cat(
            [input_ids[nb_indices.view(-1)], nb_tokens.view(-1, 1)], dim=-1
        )
        attn = inputs["attention_mask"]

    # finalize (4.26): surviving live beams join the pool for batches not done
    for i in range(b):
        if done[i]:
            continue
        for j in range(k):
            row = i * k + j
            hyps[i].add(input_ids[row].clone(), float(beam_scores[row]))
    out = torch.full((b, max_length), PAD, dtype=torch.long)
    for i in range(b):
        best = max(hyps[i].beams, key=lambda x: x[0])[1]
        n = best.shape[-1]
        out[i, :n] = best
        if n < max_length:
            out[i, n] = SEP
    return out.numpy()


@pytest.mark.parametrize("use_cache", [True, False])
def test_beam_matches_reference_hf_beam(setup, use_cache):
    """Exact token match vs the reference HF beam (num_beams=3,
    length_penalty=0.6 — the demo decode, inference_demo.py:164-171) over
    32 random conditions, covering early-EOS and max-length finalize."""
    ref_model, _, params = setup
    rng = np.random.default_rng(11)
    cond = rng.standard_normal((32, 7, CFG.encoder_width)).astype(np.float32)
    want = reference_beam_decode(
        ref_model, cond, max_new=12, num_beams=3, length_penalty=0.6
    )
    got = np.asarray(
        generate(params, CFG, jnp.asarray(cond), max_new_tokens=12,
                 mode="beam", num_beams=3, length_penalty=0.6,
                 use_cache=use_cache)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_cache", [True, False])
def test_qa_beam_matches_reference_hf_beam(setup, use_cache):
    """QA beam parity: question prefix prefilled via the reference's
    update_attention_mask init (data/model/vast.py:617-650), num_beams=3,
    default length_penalty 1.0 (the reference QA generate passes none)."""
    from mico_tpu.generation import generate_answers

    ref_model, _, params = setup
    rng = np.random.default_rng(12)
    b, lq = 16, 9
    cond = rng.standard_normal((b, 7, CFG.encoder_width)).astype(np.float32)
    q_ids = np.zeros((b, lq), np.int64)
    q_mask = np.zeros((b, lq), np.int64)
    for i in range(b):
        n = int(rng.integers(4, lq + 1))
        q_ids[i, 0] = CLS
        q_ids[i, 1 : n - 1] = rng.integers(4, 100, (n - 2,))
        q_ids[i, n - 1] = SEP
        q_mask[i, :n] = 1
    want = reference_beam_decode(
        ref_model, cond, max_new=8, num_beams=3, length_penalty=1.0,
        q_ids=torch.from_numpy(q_ids), q_mask=torch.from_numpy(q_mask),
    )
    got = np.asarray(
        generate_answers(params, CFG, jnp.asarray(q_ids),
                         jnp.asarray(q_mask), jnp.asarray(cond),
                         max_new_tokens=8, mode="beam", num_beams=3,
                         length_penalty=1.0, use_cache=use_cache)
    )
    # ours returns the [CLS]+answer slice; reference rows include the prefix
    np.testing.assert_array_equal(got, want[:, lq:])


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


def test_cached_beam_k5_matches_recompute(setup):
    """Deeper beam (k=5, longer horizon) exercises multi-generation ancestry
    inheritance in the regather-free cached beam (generation.py
    cached_beam_generate: ancestry-masked in-group attention) against the
    recompute loop's physical per-step beam reordering."""
    from mico_tpu.generation import cached_beam_generate

    _, cond, params = setup
    cond_j = jnp.asarray(cond)
    want = np.asarray(
        generate(params, CFG, cond_j, max_new_tokens=14, mode="beam",
                 num_beams=5, use_cache=False)
    )
    got = np.asarray(
        cached_beam_generate(params, CFG, cond_j, max_new_tokens=14,
                             num_beams=5)
    )
    np.testing.assert_array_equal(got, want)


def test_cross_kv_split_heads_exactness(setup):
    """CROSS_KV_SPLIT_HEADS stores the per-layer cross K/V as
    (B, nh, Lk, hd) so each (batch, head) DMA stream reads contiguously
    (the round-5 beam cross-read layout experiment). It is a pure
    transpose: greedy, beam, and prefilled-QA outputs must be
    bit-identical to the packed layout."""
    from mico_tpu import generation as gen

    _, cond, params = setup
    cond_j = jnp.asarray(cond)
    q = jnp.asarray(np.array([[101, 2054, 2003, 102, 0, 0]] * cond.shape[0],
                             np.int32))
    qm = jnp.asarray((np.asarray(q) != 0).astype(np.int32))
    from mico_tpu.generation import (
        cached_beam_generate,
        cached_generate,
        generate_answers,
    )

    runs = {}
    for flag in (False, True):
        gen.CROSS_KV_SPLIT_HEADS = flag
        try:
            runs[flag] = (
                np.asarray(cached_generate(params, CFG, cond_j,
                                           max_new_tokens=8, mode="greedy")),
                np.asarray(cached_beam_generate(params, CFG, cond_j,
                                                max_new_tokens=8,
                                                num_beams=3)),
                np.asarray(generate_answers(params, CFG, q, qm, cond_j,
                                            max_new_tokens=4, mode="greedy",
                                            use_cache=True)),
            )
        finally:
            gen.CROSS_KV_SPLIT_HEADS = False
    for a, b in zip(runs[False], runs[True]):
        np.testing.assert_array_equal(a, b)
