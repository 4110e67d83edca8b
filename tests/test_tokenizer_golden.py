"""BPE tokenizer golden vs the HuggingFace CLIPTokenizer (independent oracle).

The sandbox has no `bpe_simple_vocab_16e6.txt.gz` (zero egress), so the real
CLIP ids cannot be produced here; what CAN be proven pre-checkpoint is that
our BPE ALGORITHM — byte-level unicode map, regex word split, text cleanup,
greedy lowest-rank merges, </w> end-of-word handling, vocab assembly from a
merges table — matches the canonical implementation exactly. We train a tiny
deterministic merge table in-test, hand the identical table to
`transformers.CLIPTokenizer` (the HF port of the same algorithm the
reference's open_clip.tokenize uses, condition.py:213) and to our
`utils/tokenizer.CLIPTokenizer`, and assert identical ids over prompts that
exercise merges, punctuation, digits, casing, and whitespace cleanup. With
the real merges file in place the same code path produces real CLIP ids.
"""

import gzip
import json
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from viewcrafter_tpu.utils.tokenizer import CLIPTokenizer, _bytes_to_unicode, tokenize

CORPUS = (
    "a photo of a cat sitting on a mat rotating view of a scene camera moving "
    "around the scene a masterpiece best quality the quick brown fox jumps over "
    "the lazy dog a painting of a sunset over mountains high resolution photo of "
    "the mountains a cinematic rotating camera view the cat and the dog sitting"
).split()

PROMPTS = [
    "a photo of a cat",
    "Rotating view of a scene",
    "the quick brown fox!!",
    "a painting, of a sunset; over 12 mountains",
    "  A   CAT\tsitting\non a mat  ",
    "masterpiece, best quality, cinematic",
    "unseen wordzzz with no merges",
    "",
]


def _train_merges(corpus, max_merges=200):
    """Classic BPE training (most-frequent pair, deterministic tie-break) on
    CLIP-style symbols (last byte of each word carries </w>)."""
    be = _bytes_to_unicode()
    words = {}
    for w in corpus:
        enc = w.encode("utf-8")
        sym = tuple(be[b] for b in enc[:-1]) + (be[enc[-1]] + "</w>",)
        words[sym] = words.get(sym, 0) + 1
    merges = []
    for _ in range(max_merges):
        pairs = {}
        for sym, c in words.items():
            for p in zip(sym[:-1], sym[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = max(sorted(pairs), key=lambda p: pairs[p])
        if pairs[best] < 2:
            break
        merges.append(best)
        new = {}
        for sym, c in words.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        words = new
    return merges


@pytest.fixture(scope="module")
def bpe_table(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bpe")
    merges = _train_merges(CORPUS)
    assert len(merges) >= 20  # table must actually exercise the merge loop
    be = _bytes_to_unicode()
    vocab = (
        list(be.values())
        + [v + "</w>" for v in be.values()]
        + ["".join(m) for m in merges]
        + ["<|startoftext|>", "<|endoftext|>"]
    )
    merges_txt = "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n"
    mpath = os.path.join(tmp, "merges.txt")
    vpath = os.path.join(tmp, "vocab.json")
    gzpath = os.path.join(tmp, "bpe_simple_vocab_16e6.txt.gz")
    with open(mpath, "w") as f:
        f.write(merges_txt)
    with open(vpath, "w") as f:
        json.dump(dict(zip(vocab, range(len(vocab)))), f)
    with gzip.open(gzpath, "wt") as f:
        f.write(merges_txt)
    return {"merges": mpath, "vocab": vpath, "gz": gzpath, "n_vocab": len(vocab)}


def test_bpe_matches_hf_clip(bpe_table):
    hf = transformers.CLIPTokenizer(bpe_table["vocab"], bpe_table["merges"])
    ours = CLIPTokenizer(bpe_table["gz"])
    sot, eot = bpe_table["n_vocab"] - 2, bpe_table["n_vocab"] - 1
    for prompt in PROMPTS:
        ref = hf(prompt)["input_ids"]
        assert ref[0] == sot and ref[-1] == eot
        got = ours.encode(prompt)
        assert got == ref[1:-1], f"{prompt!r}: ours={got} hf={ref[1:-1]}"


def test_tokenize_framing(bpe_table, monkeypatch):
    """tokenize(): sot/eot frame, zero pad, truncation keeps eot last."""
    import viewcrafter_tpu.utils.tokenizer as tkn

    monkeypatch.setenv("VIEWCRAFTER_BPE_PATH", bpe_table["gz"])
    monkeypatch.setattr(tkn, "_TOKENIZER", None)
    try:
        ids = tokenize(["a photo of a cat", ""], context_length=77, allow_fallback=False)
        assert ids.shape == (2, 77) and ids.dtype == np.int32
        assert ids[0, 0] == tkn.SOT and ids[1, 0] == tkn.SOT
        assert ids[1, 1] == tkn.EOT  # empty prompt: just the frame
        row = ids[0][ids[0] != 0]
        assert row[-1] == tkn.EOT
        long = tokenize("cat " * 300, context_length=77, allow_fallback=False)
        assert long[0, 76] == tkn.EOT  # truncated, eot kept last
        assert (long[0] != 0).all()
    finally:
        monkeypatch.setattr(tkn, "_TOKENIZER", None)
