"""CLIP byte-pair-encoding tokenizer (self-contained reimplementation).

The reference calls `open_clip.tokenize` (lvdm/modules/encoders/condition.py:213),
which is the standard CLIP BPE: byte-level unicode mapping, lowercase + basic
cleanup, greedy lowest-rank merges, `</w>` end-of-word markers, 49408-entry
vocab assembled from the `bpe_simple_vocab_16e6.txt.gz` merges file, and
77-token sequences framed by <|startoftext|>/<|endoftext|>.

The merges file ships with every CLIP checkpoint distribution; we load it from
(in order) $VIEWCRAFTER_BPE_PATH, ./checkpoints/, or alongside a provided
checkpoint path. Without it (e.g. air-gapped dev boxes) `tokenize` can fall
back to a deterministic hash encoding so random-weight pipelines still run —
clearly not real CLIP ids; real checkpoints require the real merges.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import List, Sequence

import numpy as np

CONTEXT_LENGTH = 77
SOT = 49406
EOT = 49407

_SEARCH_PATHS = (
    "checkpoints/bpe_simple_vocab_16e6.txt.gz",
    os.path.expanduser("~/.cache/viewcrafter_tpu/bpe_simple_vocab_16e6.txt.gz"),
)


@functools.lru_cache()
def _bytes_to_unicode():
    """Reversible byte -> printable-unicode map (GPT-2/CLIP construction)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _clean_text(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text).strip()
    return text.lower()


_WORD_RE = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[^\W\d_]+|\d|[^\s\w]+",
    re.IGNORECASE | re.UNICODE,
)


class CLIPTokenizer:
    def __init__(self, bpe_path: str):
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        self.byte_encoder = _bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>", "<|endoftext|>": "<|endoftext|>"}

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in _WORD_RE.findall(_clean_text(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids


_TOKENIZER: CLIPTokenizer | None = None


def find_bpe_path() -> str | None:
    cand = [os.environ.get("VIEWCRAFTER_BPE_PATH", "")]
    cand += list(_SEARCH_PATHS)
    for p in cand:
        if p and os.path.exists(p):
            return p
    return None


def _get_tokenizer() -> CLIPTokenizer | None:
    global _TOKENIZER
    if _TOKENIZER is None:
        path = find_bpe_path()
        if path:
            _TOKENIZER = CLIPTokenizer(path)
    return _TOKENIZER


_warned_fallback = False


def _fallback_ids(text: str) -> List[int]:
    """Deterministic stand-in ids when no merges file exists (dev only)."""
    global _warned_fallback
    if not _warned_fallback:
        _warned_fallback = True
        import warnings

        warnings.warn(
            "CLIP BPE merges file not found — using HASH-FALLBACK token ids. "
            "Fine for random-weight development; text conditioning is garbage "
            "with real checkpoints. Place bpe_simple_vocab_16e6.txt.gz in "
            "./checkpoints/ or set VIEWCRAFTER_BPE_PATH.",
            stacklevel=3,
        )
    words = _clean_text(text).split()
    return [1000 + (hash(w) % 48000) for w in words]


def tokenize(texts: Sequence[str] | str, context_length: int = CONTEXT_LENGTH, allow_fallback: bool = True) -> np.ndarray:
    """Texts -> (N, context_length) int32 ids, sot/eot framed, zero padded,
    truncated with eot kept last (open_clip semantics)."""
    if isinstance(texts, str):
        texts = [texts]
    tok = _get_tokenizer()
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        if tok is not None:
            ids = tok.encode(text)
        elif allow_fallback:
            ids = _fallback_ids(text)
        else:
            raise FileNotFoundError(
                "CLIP BPE merges file not found; set VIEWCRAFTER_BPE_PATH or place "
                "bpe_simple_vocab_16e6.txt.gz in ./checkpoints/"
            )
        ids = [SOT] + ids[: context_length - 2] + [EOT]
        out[i, : len(ids)] = ids
    return out
