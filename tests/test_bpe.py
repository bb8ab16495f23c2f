"""Golden parity for the CLIP byte-BPE tokenizer vs the reference
SimpleTokenizer (model/evaclip/tokenizer.py), using the reference's vendored
merge table as data."""

import sys
import types

import numpy as np
import pytest

from reference_loader import REF, _stub

VOCAB = f"{REF}/model/evaclip/bpe_simple_vocab_16e6.txt.gz"

TEXTS = [
    "a photo of a cat",
    "The QUICK brown fox; jumped over 12 lazy dogs!",
    "it's   spaced\tout\nweirdly &amp; escaped",
    "emoji 🌮 and café naïve résumé",
    "word" * 60,  # overlong → truncation with forced EOT
    "",
    "1234567890",
    "multi—dash…punct!!!",
]


@pytest.fixture(scope="module")
def ref_tokenize():
    _stub("ftfy", fix_text=lambda t: t)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_clip_tokenizer", f"{REF}/model/evaclip/tokenizer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_clip_tokenizer"] = mod
    spec.loader.exec_module(mod)
    # the reference comments out `import ftfy` but still calls it in
    # basic_clean — inject an identity shim into the module globals
    mod.ftfy = types.SimpleNamespace(fix_text=lambda t: t)
    return mod.tokenize


@pytest.fixture(scope="module")
def tok():
    from mico_tpu.text.bpe import ClipBpeTokenizer

    return ClipBpeTokenizer(VOCAB)


def test_bpe_golden_parity(ref_tokenize, tok):
    want = ref_tokenize(TEXTS, context_length=77).numpy()
    got = tok(TEXTS, context_length=77)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_bpe_roundtrip(tok):
    ids = tok.encode("a photo of a tpu pod slice")
    assert tok.decode(ids).strip() == "a photo of a tpu pod slice"


def test_bpe_special_aliases(tok):
    assert tok.token_to_id["<start_of_text>"] == tok.sot_id
    assert tok.token_to_id["<|startoftext|>"] == tok.sot_id
    assert tok.vocab_size == 49408
