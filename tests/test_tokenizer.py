"""WordPiece tokenizer parity vs HF BertTokenizer on the reference vocab."""

import numpy as np
import pytest

from mico_tpu.text import BertWordPieceTokenizer

VOCAB = "/root/reference/model/tokenizer/vocab.txt"

SENTENCES = [
    "a man is skiing in a snowy day.",
    "it's a hot day",
    "Hello, WORLD!  Ünïcode café — naïve résumé.",
    "thequickbrownfoxjumpsoverthelazydogsupercalifragilistic",
    "数字 and 中文 mixed with english",
    "",
    "multi\nline\ttext   with spaces",
]


@pytest.fixture(scope="module")
def ours():
    return BertWordPieceTokenizer(VOCAB)


@pytest.fixture(scope="module")
def theirs():
    from transformers import BertTokenizer

    return BertTokenizer(VOCAB)


@pytest.mark.parametrize("idx", range(len(SENTENCES)))
def test_tokenize_parity(ours, theirs, idx):
    text = SENTENCES[idx]
    assert ours.tokenize(text) == theirs.tokenize(text)


def test_batch_encode_parity(ours, theirs):
    got = ours(SENTENCES[:4], max_length=30)
    want = theirs(
        SENTENCES[:4],
        padding="max_length",
        truncation=True,
        max_length=30,
        return_tensors="np",
    )
    np.testing.assert_array_equal(got["input_ids"], want["input_ids"])
    np.testing.assert_array_equal(got["attention_mask"], want["attention_mask"])


def test_special_token_bindings(ours):
    assert ours.cls_token_id == 101
    assert ours.sep_token_id == 102
    assert ours.pad_token_id == 0
    assert ours.mask_token_id == 103
    assert ours.bos_token_id == ours.cls_token_id
    assert ours.eos_token_id == ours.sep_token_id


def test_decode_roundtrip(ours):
    ids = ours.encode("a man is skiing in a snowy day.", max_length=30)
    assert ours.decode(ids) == "a man is skiing in a snowy day ."
