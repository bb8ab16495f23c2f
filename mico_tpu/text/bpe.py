"""Byte-level BPE tokenizer for the CLIP text towers.

Capability parity with the OpenAI/EVA-CLIP SimpleTokenizer
(reference: model/clip/clip_tokenizer.py:1-179,
model/evaclip/tokenizer.py:1-201): GPT-2 byte→unicode alphabet, rank-greedy
pair merging over word pieces with an end-of-word marker, the CLIP merge
table (48,894 merges), lowercasing + whitespace collapse, and the
`[SOT] ids [EOT]` fixed-length layout with truncation forcing a final [EOT].

This is a from-scratch implementation of the published algorithm; the merge
table itself is DATA, loaded from a `.txt(.gz)` file (same format the
reference vendors as `bpe_simple_vocab_16e6.txt.gz`). Point `vocab_path`
at any such file, or set $MICO_BPE_VOCAB.

Both special-token spellings are registered (`<|startoftext|>` /
`<start_of_text>` et al.) so either checkpoint family round-trips.
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

# number of merge lines the CLIP vocab uses: 49,152 "full" table minus the
# 256 byte units and 2 specials (the 256 `</w>` variants are extra rows of
# the final 49,408 vocab, not merge lines)
N_MERGES = 49152 - 256 - 2

_WORD_END = "</w>"


@lru_cache()
def _byte_alphabet() -> Dict[int, str]:
    """GPT-2 reversible byte→printable-unicode map: printable ASCII/Latin-1
    bytes map to themselves, the rest to codepoints 256+. Insertion order
    (printables first, shifted bytes appended) defines the unit-token id
    order and must match the published vocab layout."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    table = {b: chr(b) for b in keep}
    shifted = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + shifted)
            shifted += 1
    return table


def _adjacent_pairs(piece: Tuple[str, ...]):
    return set(zip(piece[:-1], piece[1:]))


def _clean_text(text: str) -> str:
    # the reference additionally runs ftfy.fix_text; mojibake repair is a
    # no-op on well-formed utf-8, which is all our data pipeline produces
    text = html.unescape(html.unescape(text))
    return " ".join(text.split())


def default_vocab_path() -> str:
    env = os.environ.get("MICO_BPE_VOCAB")
    if env:
        return env
    here = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "assets", "bpe_vocab.txt.gz",
    )
    if os.path.exists(here):
        return os.path.abspath(here)
    raise FileNotFoundError(
        "no BPE merge table found: pass vocab_path= or set $MICO_BPE_VOCAB "
        "to a CLIP-format merges file (txt or txt.gz)"
    )


class ClipBpeTokenizer:
    # the CLIP word splitter: contractions, letter runs, single digits,
    # punctuation runs (unicode-aware; case-insensitive)
    _PATTERN = (
        r"'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
    )

    # accept either published spelling for the two specials
    SOT_NAMES = ("<|startoftext|>", "<start_of_text>")
    EOT_NAMES = ("<|endoftext|>", "<end_of_text>")

    def __init__(self, vocab_path: str = None):
        import regex

        vocab_path = vocab_path or default_vocab_path()
        opener = gzip.open if vocab_path.endswith(".gz") else open
        with opener(vocab_path, "rb") as f:
            lines = f.read().decode("utf-8").split("\n")
        # line 0 is a header/version comment in the CLIP file
        merges = [tuple(ln.split()) for ln in lines[1 : N_MERGES + 1]]
        self.merge_rank = {m: i for i, m in enumerate(merges)}

        units = list(_byte_alphabet().values())
        tokens = units + [u + _WORD_END for u in units]
        tokens += ["".join(m) for m in merges]
        tokens += ["<|startoftext|>", "<|endoftext|>"]
        self.token_to_id = {t: i for i, t in enumerate(tokens)}
        self.id_to_token = {i: t for t, i in self.token_to_id.items()}
        # alias ids for the alternate special spellings
        self.sot_id = self.token_to_id["<|startoftext|>"]
        self.eot_id = self.token_to_id["<|endoftext|>"]
        for name in self.SOT_NAMES:
            self.token_to_id.setdefault(name, self.sot_id)
        for name in self.EOT_NAMES:
            self.token_to_id.setdefault(name, self.eot_id)

        self.byte_to_unit = _byte_alphabet()
        self.unit_to_byte = {v: k for k, v in self.byte_to_unit.items()}
        self._splitter = regex.compile(self._PATTERN, regex.IGNORECASE)
        self._cache: Dict[str, List[str]] = {}

    @property
    def vocab_size(self) -> int:
        return len(self.id_to_token)

    # -- core BPE ----------------------------------------------------------

    def _merge_word(self, word: str) -> List[str]:
        """One whitespace-free word (already byte-mapped) → merged pieces."""
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        piece = tuple(word[:-1]) + (word[-1] + _WORD_END,)
        if len(piece) == 1:
            return [word + _WORD_END]
        pairs = _adjacent_pairs(piece)
        while pairs:
            best = min(pairs, key=lambda p: self.merge_rank.get(p, 1 << 30))
            if best not in self.merge_rank:
                break
            a, b = best
            merged = []
            i = 0
            while i < len(piece):
                if i < len(piece) - 1 and piece[i] == a and piece[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(piece[i])
                    i += 1
            piece = tuple(merged)
            if len(piece) == 1:
                break
            pairs = _adjacent_pairs(piece)
        out = list(piece)
        self._cache[word] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in self._splitter.findall(_clean_text(text).lower()):
            mapped = "".join(self.byte_to_unit[b] for b in word.encode("utf-8"))
            ids.extend(self.token_to_id[p] for p in self._merge_word(mapped))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.id_to_token[int(i)] for i in ids)
        raw = bytearray(
            self.unit_to_byte[c] for c in text if c in self.unit_to_byte
        )
        return raw.decode("utf-8", errors="replace").replace(_WORD_END, " ")

    # -- fixed-length batch layout ------------------------------------------

    def __call__(
        self, texts: Union[str, List[str]], context_length: int = 77
    ) -> np.ndarray:
        """→ int32 (N, context_length): [SOT] ids [EOT] zero-padded;
        over-long inputs truncated with [EOT] forced at the last slot
        (reference tokenize(), model/evaclip/tokenizer.py:156-186)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot_id] + self.encode(t) + [self.eot_id]
            if len(ids) > context_length:
                ids = ids[:context_length]
                ids[-1] = self.eot_id
            out[i, : len(ids)] = ids
        return out
