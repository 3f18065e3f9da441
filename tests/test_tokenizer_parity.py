"""BPE algorithm parity with transformers' CLIPTokenizer (VERDICT r1 item 6).

The official vocab.json/merges.txt can't be fetched in this zero-egress
image, so asset-level goldens aren't possible here. What CAN be proven is
*algorithm* parity: on identical (synthetic, byte-level-complete) vocab and
merges files — including unicode and multi-merge interactions — our
from-scratch BPE must produce exactly the ids the reference's tokenizer
class produces (train_with_lora_per_class.py:305). With the algorithm pinned
and `validate_clip_assets` checking the official files' structural constants
(49,408 entries, bos/eos 49406/49407, 48,894 merges), the only remaining
gap to real CLIP is dropping the published files into `tokenizer/`.

A no-op ftfy stub is injected so transformers takes the real CLIP text
path — its no-ftfy fallback (BasicTokenizer) deviates from the published
algorithm on consecutive punctuation and accents.
"""

import json
import sys
import types

import numpy as np
import pytest

from polyp_tpu.models.clip_tokenizer import (
    CLIPBPETokenizer,
    bytes_to_unicode,
    validate_clip_assets,
)

PROMPTS = [
    "a realistic photo of colon polyp",          # the reference prompt (:169)
    "An image of sessile serrated polyp",
    "a photo of a HYPERPLASTIC polyp!!",
    "the    whitespace\tcleanup   test ",
    "it's the 1st of 23 polyps...",
    "naïve café görüntü",                        # unicode \p{L} words
    "a photo of sks polyp",                      # DreamBooth special token
    "zbt and mjt polyps together",
]


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Synthetic byte-level-complete BPE assets: every byte symbol (±</w>)
    plus a merge chain with rank interactions and a unicode merge."""
    d = tmp_path_factory.mktemp("clip_assets")
    syms = list(bytes_to_unicode().values())
    vocab: dict[str, int] = {}
    for s in syms:
        vocab[s] = len(vocab)
    for s in syms:
        vocab[s + "</w>"] = len(vocab)
    merges = [
        "p o", "po l", "pol y", "poly p</w>",     # polyp → one token
        "t h", "th e</w>",                        # the
        "o f</w>",
        "h o", "ho t", "p hot", "phot o</w>",     # photo via odd splits
        "Ã ¯",                                    # ï (2 utf-8 bytes)
        "Ã ©",                                    # é
        "1 2",                                    # digits merge (single \p{N}
                                                  # pieces never pair — dead
                                                  # merge, exercises ranking)
        "s k", "sk s</w>",                        # sks as a LEARNED word too
    ]
    for m in merges:
        a, b = m.split()
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n",
                                  encoding="utf-8")
    return d


@pytest.fixture(scope="module")
def hf_tokenizer(assets):
    if "ftfy" not in sys.modules:
        import importlib.machinery
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s  # identity on well-formed text
        stub.__spec__ = importlib.machinery.ModuleSpec("ftfy", None)
        stub.__version__ = "6.0.0"
        sys.modules["ftfy"] = stub
    from transformers import CLIPTokenizer as HFTok
    return HFTok(str(assets / "vocab.json"), str(assets / "merges.txt"),
                 model_max_length=77)


@pytest.fixture(scope="module")
def ours(assets):
    return CLIPBPETokenizer(assets / "vocab.json", assets / "merges.txt",
                            max_length=77)


class TestAlgorithmParity:
    def test_tokenize_matches_transformers(self, ours, hf_tokenizer):
        for prompt in PROMPTS:
            assert ours.tokenize(prompt) == hf_tokenizer.tokenize(prompt), \
                prompt

    def test_padded_ids_match_transformers(self, ours, hf_tokenizer):
        theirs = hf_tokenizer(PROMPTS, padding="max_length", max_length=77,
                              truncation=True)["input_ids"]
        np.testing.assert_array_equal(ours(PROMPTS), np.asarray(theirs))

    def test_truncation_matches(self, ours, hf_tokenizer):
        long = "polyp " * 200
        theirs = hf_tokenizer([long], padding="max_length", max_length=77,
                              truncation=True)["input_ids"]
        got = ours([long])
        assert got.shape == (1, 77)
        np.testing.assert_array_equal(got, np.asarray(theirs))

    def test_added_tokens_match(self, assets, hf_tokenizer):
        mine = CLIPBPETokenizer(assets / "vocab.json", assets / "merges.txt")
        mine.add_tokens(["zbt", "mjt"])
        hf_tokenizer.add_tokens(["zbt", "mjt"])
        assert (mine.convert_tokens_to_ids("zbt")
                == hf_tokenizer.convert_tokens_to_ids("zbt"))
        assert len(mine) == len(hf_tokenizer)
        prompt = "a photo of zbt polyp"
        theirs = hf_tokenizer([prompt], padding="max_length", max_length=77,
                              truncation=True)["input_ids"]
        np.testing.assert_array_equal(mine([prompt]), np.asarray(theirs))

    def test_unicode_pretokenization_is_single_word(self, ours):
        # the \p{L} pattern keeps unicode words whole (round 1 dead-coded it)
        pieces = [t for t in ours.tokenize("naïve café")]
        # BPE may split, but the per-character ASCII fallback would produce
        # byte-garbage tokens; the merges above re-join the accent bytes
        assert "Ã¯" in "".join(pieces) or any("Ã¯" in p for p in pieces)


class TestAssetValidation:
    def test_synthetic_assets_rejected_as_official(self, assets):
        vocab = json.loads((assets / "vocab.json").read_text())
        merges = [tuple(m.split()) for m in
                  (assets / "merges.txt").read_text().splitlines()[1:] if m]
        problems = validate_clip_assets(vocab, dict(
            (m, i) for i, m in enumerate(merges)))
        assert problems  # synthetic ≠ official
        with pytest.raises(ValueError):
            CLIPBPETokenizer(assets / "vocab.json", assets / "merges.txt",
                             strict=True)

    def test_official_shape_passes(self):
        # a structurally-official fake: right sizes and special ids
        syms = list(bytes_to_unicode().values())
        vocab = {}
        for s in syms:
            vocab[s] = len(vocab)
        for s in syms:
            vocab[s + "</w>"] = len(vocab)
        merges = {}
        for i in range(49408 - 512 - 2):
            vocab[f"m{i}"] = len(vocab)
            merges[(f"a{i}", f"b{i}")] = i
        vocab["<|startoftext|>"] = len(vocab)
        vocab["<|endoftext|>"] = len(vocab)
        assert validate_clip_assets(vocab, merges) == []
