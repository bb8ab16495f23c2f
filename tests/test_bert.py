"""BERT interface branch golden parity vs the reference fork (model/bert.py)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from mico_tpu.config import BertConfig
from mico_tpu.convert import bert_from_torch
from mico_tpu.models.bert import bert_forward, extended_attention_mask

from reference_loader import load_bert_module

CFG = BertConfig(
    vocab_size=120,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
    encoder_width=64,
)


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
    torch.manual_seed(0)
    model = mod.BertForMaskedLM(hf_cfg)
    model.eval()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    return model


@pytest.fixture(scope="module")
def params(ref_model):
    return bert_from_torch(ref_model.state_dict(), CFG)


def _tokens(rng, b, l):
    ids = rng.integers(5, CFG.vocab_size, (b, l))
    mask = np.ones((b, l), np.int64)
    mask[0, l - 3 :] = 0
    return ids, mask


def test_self_attention_parity(rng, ref_model, params):
    ids, mask = _tokens(rng, 2, 12)
    with torch.no_grad():
        want = ref_model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).sequence_output.numpy()
    got = np.asarray(
        bert_forward(params, CFG, jnp.asarray(ids), jnp.asarray(mask)).sequence_output
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cross_attention_parity(rng, ref_model, params):
    ids, mask = _tokens(rng, 2, 9)
    cond = rng.standard_normal((2, 17, CFG.encoder_width)).astype(np.float32)
    with torch.no_grad():
        want = ref_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=torch.from_numpy(cond),
        ).sequence_output.numpy()
    got = np.asarray(
        bert_forward(
            params, CFG, jnp.asarray(ids), jnp.asarray(mask),
            encoder_hidden_states=jnp.asarray(cond),
        ).sequence_output
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_causal_3d_mask_and_mlm_loss_parity(rng, ref_model, params):
    b, l = 2, 10
    ids, _ = _tokens(rng, b, l)
    causal = np.tril(np.ones((l, l), np.int64))[None].repeat(b, 0)
    labels = ids.copy()
    labels[:, : l // 2] = -100
    cond = rng.standard_normal((b, 7, CFG.encoder_width)).astype(np.float32)
    with torch.no_grad():
        out = ref_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(causal),
            encoder_hidden_states=torch.from_numpy(cond),
            labels=torch.from_numpy(labels),
        )
    got = bert_forward(
        params, CFG, jnp.asarray(ids), jnp.asarray(causal),
        encoder_hidden_states=jnp.asarray(cond),
        labels=jnp.asarray(labels),
    )
    np.testing.assert_allclose(
        np.asarray(got.logits), out.logits.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        float(got.loss), float(out.loss), rtol=1e-4, atol=1e-5
    )


def test_extended_mask_values():
    m2 = jnp.asarray([[1, 1, 0]])
    e = extended_attention_mask(m2)
    assert e.shape == (1, 1, 1, 3)
    assert float(e[0, 0, 0, 2]) == -10000.0
    m3 = jnp.asarray(np.tril(np.ones((4, 4)))[None])
    assert extended_attention_mask(m3).shape == (1, 1, 4, 4)


def test_dropout_contract(rng, params):
    """Training dropout (reference model/bert.py:93,169,291,369 + config
    hidden/attention dropout 0.1): rng-on changes outputs stochastically,
    same rng is deterministic, rng=None (eval) is exactly the no-dropout
    forward the goldens above certify."""
    import jax

    ids, mask = _tokens(rng, 2, 12)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    cond = jnp.asarray(rng.standard_normal((2, 7, CFG.encoder_width)), jnp.float32)

    eval1 = bert_forward(params, CFG, ids, mask, cond).sequence_output
    eval2 = bert_forward(params, CFG, ids, mask, cond).sequence_output
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))

    k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    tr1 = bert_forward(params, CFG, ids, mask, cond, train_rng=k1).sequence_output
    tr1b = bert_forward(params, CFG, ids, mask, cond, train_rng=k1).sequence_output
    tr2 = bert_forward(params, CFG, ids, mask, cond, train_rng=k2).sequence_output
    np.testing.assert_array_equal(np.asarray(tr1), np.asarray(tr1b))
    assert np.abs(np.asarray(tr1) - np.asarray(eval1)).max() > 1e-4
    assert np.abs(np.asarray(tr1) - np.asarray(tr2)).max() > 1e-4

    # dropout-off config: train_rng present but rates 0 → identical to eval
    import dataclasses
    cfg0 = dataclasses.replace(
        CFG, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
    )
    tr0 = bert_forward(params, cfg0, ids, mask, cond, train_rng=k1).sequence_output
    np.testing.assert_allclose(
        np.asarray(tr0), np.asarray(eval1), rtol=1e-6, atol=1e-6
    )


def test_dropout_magnitude(rng, params):
    """Inverted-dropout scaling: train-mode activations stay on the eval
    scale (means within a loose band), i.e. 1/keep compensation applied."""
    import jax

    ids, mask = _tokens(rng, 4, 16)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    ev = np.asarray(
        bert_forward(params, CFG, ids, mask).sequence_output, np.float32
    )
    tr = np.asarray(
        bert_forward(
            params, CFG, ids, mask, train_rng=jax.random.PRNGKey(7)
        ).sequence_output,
        np.float32,
    )
    assert 0.5 < np.abs(tr).mean() / np.abs(ev).mean() < 2.0


def test_bert_unroll_route_equivalence():
    """BERT_UNROLL=True (python-unrolled layer march, the train_bench
    --bert-unroll A/B route) matches the default lax.scan march to float
    reassociation (<1e-6), eval and training — a dropout-mask divergence
    (wrong per-layer rng order) would show O(1) differences."""
    import jax

    from mico_tpu.models import bert as bert_mod
    from mico_tpu.models.bert import init_bert

    cfg = BertConfig(
        vocab_size=500, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, encoder_width=32,
    )
    params = init_bert(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(106, 500, (2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    cond = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    cmask = jnp.ones((2, 6), jnp.int32)

    def run(train):
        return bert_forward(
            params, cfg, ids, mask, encoder_hidden_states=cond,
            encoder_attention_mask=cmask,
            train_rng=jax.random.PRNGKey(7) if train else None,
        ).sequence_output

    for train in (False, True):
        want = run(train)
        try:
            bert_mod.BERT_UNROLL = True
            got = run(train)
        finally:
            bert_mod.BERT_UNROLL = False
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
