"""Native WordPiece tokenizer vs the transformers BertTokenizer oracle.

The reward path tokenizes prompts BERT-uncased style (reference:
src/reward_models/ImageReward/ImageReward.py:111-112, max_length 35);
tpdm_tpu/utils/bert_tokenizer.py re-implements it natively. Parity here is
id-level against the independent transformers implementation instantiated
from the same synthetic vocab.txt.
"""

import os

import numpy as np
import pytest

from tpdm_tpu.utils.bert_tokenizer import BertTokenizer

transformers = pytest.importorskip("transformers")


WORDS = [
    "the", "a", "photo", "of", "cat", "dog", "mountain", "lake", "serene",
    "hello", "world", "un", "##believ", "##able", "##s", "##ing", "run",
    "photograph", "##er", "##y", "beautiful", "paint", "##ed", "water",
    "##color", "12", "##3", "and", "on", "in",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    toks += [f"##{chr(c)}" for c in range(ord("a"), ord("z") + 1)]
    toks += [str(d) for d in range(10)] + [f"##{d}" for d in range(10)]
    toks += list(".,!?-:;'\"()&%$#@/^+`~")
    toks += ["中", "文", "日", "本", "語"]
    toks += WORDS
    path = tmp_path_factory.mktemp("bertvocab") / "vocab.txt"
    path.write_text("\n".join(toks) + "\n", encoding="utf-8")
    return str(path)


@pytest.fixture(scope="module")
def pair(vocab_file):
    ours = BertTokenizer.from_pretrained(vocab_file)
    theirs = transformers.BertTokenizer(vocab_file, do_lower_case=True)
    return ours, theirs


TEXTS = [
    "a photo of a cat",
    "A Photo OF a DOG!",
    "hello, world...",
    "unbelievable photography",
    "the painted watercolor lake, serene & beautiful",
    "running runs run",          # un-matchable words -> [UNK]
    "café naïve résumé",         # accent stripping
    "中文 and 日本語 text",        # CJK isolation (each char its own token)
    "日本語",                     # no spaces around CJK in input
    "price: $123 (12% off)",
    "a" * 150,                   # > max_input_chars_per_word -> [UNK]
    "  weird   \t whitespace\n\n here ",
    "emoji 😀 is unknown",
    "",
    "!!!",
    "word-with-hyphens and/or slashes",
    "MiXeD CaSe PhOtO",
]


class TestParity:
    @pytest.mark.parametrize("text", TEXTS)
    def test_tokenize_matches(self, pair, text):
        ours, theirs = pair
        assert ours.tokenize(text) == theirs.tokenize(text), text

    @pytest.mark.parametrize("text", TEXTS)
    def test_encode_max_length_35(self, pair, text):
        ours, theirs = pair
        o = ours([text], padding="max_length", truncation=True, max_length=35)
        t = theirs(
            [text], padding="max_length", truncation=True, max_length=35,
            return_tensors="np",
        )
        np.testing.assert_array_equal(o["input_ids"], t["input_ids"])
        np.testing.assert_array_equal(o["attention_mask"], t["attention_mask"])

    def test_batch_encode(self, pair):
        ours, theirs = pair
        o = ours(TEXTS[:6], max_length=16)
        t = theirs(
            TEXTS[:6], padding="max_length", truncation=True, max_length=16,
            return_tensors="np",
        )
        np.testing.assert_array_equal(o["input_ids"], t["input_ids"])
        np.testing.assert_array_equal(o["attention_mask"], t["attention_mask"])

    def test_truncation_long_text(self, pair):
        ours, theirs = pair
        text = " ".join(["photo of a cat"] * 30)
        o = ours([text], max_length=35)
        t = theirs(
            [text], padding="max_length", truncation=True, max_length=35,
            return_tensors="np",
        )
        np.testing.assert_array_equal(o["input_ids"], t["input_ids"])
        assert o["input_ids"].shape == (1, 35)


class TestSurface:
    def test_from_pretrained_dir(self, vocab_file, tmp_path):
        d = tmp_path / "hfdir"
        d.mkdir()
        (d / "vocab.txt").write_text(
            open(vocab_file, encoding="utf-8").read(), encoding="utf-8"
        )
        tok = BertTokenizer.from_pretrained(str(d))
        assert tok.tokenize("a photo") == ["a", "photo"]

    def test_missing_special_raises(self, tmp_path):
        p = tmp_path / "bad.txt"
        p.write_text("a\nb\n", encoding="utf-8")
        with pytest.raises(ValueError, match="special token"):
            BertTokenizer(str(p))
