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
