"""CLIP byte-pair-encoding tokenizer.

Produces the same token ids as OpenAI's reference tokenizer over the
released bpe_simple_vocab_16e6 merges (data asset under extract/assets/).
Behavioral contract: run_on_video/clip/simple_tokenizer.py + the repo's
tokenize() with max_valid_length truncation-before-EOT
(run_on_video/clip/clip.py:164-195).
"""
from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import List, Union

import numpy as np
import regex as re

VOCAB_PATH = os.path.join(
    os.path.dirname(__file__), "..", "assets", "bpe_simple_vocab_16e6.txt.gz"
)

_WORD_RE = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@lru_cache()
def _byte_unicode_table():
    """Reversible byte <-> printable-unicode mapping (GPT-2 convention)."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    chars = printable[:]
    n = 0
    for b in range(256):
        if b not in printable:
            printable.append(b)
            chars.append(256 + n)
            n += 1
    return dict(zip(printable, [chr(c) for c in chars]))


def _clean(text: str) -> str:
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip().lower()


class BPETokenizer:
    def __init__(self, vocab_path: str = VOCAB_PATH):
        with gzip.open(vocab_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges[1 : 49152 - 256 - 2 + 1]]

        byte_enc = _byte_unicode_table()
        self.byte_encoder = byte_enc
        vocab = list(byte_enc.values())
        vocab = vocab + [f"{v}</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.rank = {m: i for i, m in enumerate(merges)}
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)

        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs, key=lambda p: self.rank.get(p, float("inf")))
            if best not in self.rank:
                break
            first, second = best
            merged = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in re.findall(_WORD_RE, _clean(text)):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids


_TOKENIZER = None


def get_tokenizer() -> BPETokenizer:
    global _TOKENIZER
    if _TOKENIZER is None:
        _TOKENIZER = BPETokenizer()
    return _TOKENIZER


def tokenize(
    texts: Union[str, List[str]],
    context_length: int = 77,
    max_valid_length: int = 32,
) -> np.ndarray:
    """Texts -> (B, context_length) int32 with SOT/EOT framing; token runs
    longer than max_valid_length-2 are truncated before EOT
    (run_on_video/clip/clip.py:164-195)."""
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    sot = tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        ids = tok.encode(text)[: max_valid_length - 2]
        row = [sot] + ids + [eot]
        out[i, : len(row)] = row
    return out
