"""Native T5 unigram tokenizer vs the `tokenizers` library oracle.

The reference loads T5TokenizerFast from the SD3 checkpoint's tokenizer_3/
subfolder (reference: modeling_sd3_pnt.py:176-183); ours rebuilds the
sentencepiece-unigram scheme in pure Python (tpdm_tpu/utils/t5_tokenizer.py).
Parity here is byte-level: the same Unigram vocab is instantiated in the
independent `tokenizers` Rust implementation and every encoding must match.
"""

import json
import random
import string

import numpy as np
import pytest

from tpdm_tpu.utils.t5_tokenizer import (
    T5Tokenizer,
    UnigramModel,
    parse_spm_model,
    serialize_spm_model,
)

tokenizers = pytest.importorskip("tokenizers")


# ---------------------------------------------------------------------------
# shared fixture vocab: specials + full char coverage + random subwords
# ---------------------------------------------------------------------------
def _build_pieces():
    rng = random.Random(7)
    chars = sorted(
        set(
            string.ascii_letters
            + string.digits
            + ".,!?-:;'\"()&%$#@/"
            + "éñüçöà中文日本語"
            + "⁄"  # NFKC('½') = '1⁄2'
        )
    )
    words = [
        "the", "he", "th", "ing", "ion", "ell", "llo", "hello", "wor",
        "world", "cat", "at", "dog", "photo", "graph", "photograph", "ph",
        "oto", "moun", "tain", "mountain", "ser", "ene", "serene", "lake",
        "la", "ke", "an", "and", "nd", "er", "re", "en", "on", "es", "ti",
    ]
    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2)]
    pieces.append(("▁", rng.uniform(-11, -9), 1))
    for c in chars:
        pieces.append((c, rng.uniform(-10, -8), 1))
        pieces.append(("▁" + c, rng.uniform(-10, -8), 1))
    for w in words:
        pieces.append((w, rng.uniform(-9, -4) - 0.01 * len(w), 1))
        pieces.append(("▁" + w, rng.uniform(-9, -4) - 0.01 * len(w), 1))
    return pieces


PIECES = _build_pieces()

TEXTS = [
    "hello world",
    "The cat sat on the mat.",
    "a serene mountain lake at dawn, photograph",
    "  leading and   trailing   spaces  ",
    "tabs\tand\nnewlines",
    "punctuation, yes! (really?) -- quotes: \"ok\"",
    "digits 1234567890 and 3.14",
    "unicode: éñü çöà",
    "cjk 中文 and 日本語 mixed",
    "nfkc ligature ﬁne and fraction ½ folded",
    "ALLCAPS MiXeD case",
    "a",
    "",
    "'s 't 'll contractions",
    "hyphen-ated long-words-here",
    "percent 50% and $3 & #tag @user a/b",
]


def _oracle_tokenizer():
    """The same vocab/pipeline in the independent Rust implementation."""
    from tokenizers import Regex, Tokenizer, normalizers, pre_tokenizers
    from tokenizers.models import Unigram

    vocab = [(p, s) for p, s, _ in PIECES]
    tok = Tokenizer(Unigram(vocab, unk_id=2, byte_fallback=False))
    tok.normalizer = normalizers.Sequence(
        [
            normalizers.NFKC(),
            normalizers.Replace(Regex(r"\s+"), " "),
            normalizers.Strip(),
        ]
    )
    try:
        meta = pre_tokenizers.Metaspace(replacement="▁", prepend_scheme="always")
    except TypeError:  # older tokenizers signature
        meta = pre_tokenizers.Metaspace(replacement="▁", add_prefix_space=True)
    tok.pre_tokenizer = meta
    return tok


class TestProtobufRoundTrip:
    def test_serialize_parse_roundtrip(self):
        data = serialize_spm_model(PIECES)
        parsed = parse_spm_model(data)
        assert parsed == [(p, pytest.approx(s), t) for p, s, t in PIECES]

    def test_parser_skips_unknown_fields(self):
        # splice a foreign field (field 15, varint) between pieces — the
        # parser must skip it structurally, as protobuf readers do
        data = serialize_spm_model(PIECES[:4])
        spliced = data + bytes([15 << 3 | 0, 42]) + serialize_spm_model(PIECES[4:6])
        parsed = parse_spm_model(spliced)
        assert [p for p, _, _ in parsed] == [p for p, _, _ in PIECES[:6]]

    def test_from_spm_file(self, tmp_path):
        path = tmp_path / "spiece.model"
        path.write_bytes(serialize_spm_model(PIECES))
        tok = T5Tokenizer.from_pretrained(str(tmp_path))
        assert tok.pad_id == 0 and tok.eos_id == 1 and tok.unk_id == 2
        assert tok.encode("hello world")  # nonempty


class TestUnigramOracle:
    @pytest.fixture(scope="class")
    def ours(self):
        return T5Tokenizer(PIECES)

    @pytest.fixture(scope="class")
    def oracle(self):
        return _oracle_tokenizer()

    @pytest.mark.parametrize("text", TEXTS)
    def test_encodings_match_tokenizers(self, ours, oracle, text):
        got = ours.encode(text)
        want = oracle.encode(text, add_special_tokens=False).ids
        assert got == want, (
            f"{text!r}: ours={[ours.piece_of.get(i) for i in got]} "
            f"oracle={[ours.piece_of.get(i) for i in want]}"
        )

    def test_unknown_chars_become_unk(self, ours):
        ids = ours.encode("hello ⊗⊗ world")
        assert ours.unk_id in ids
        # fuse_unk: the two adjacent unknown chars collapse into ONE unk
        assert sum(1 for i in ids if i == ours.unk_id) == 1

    def test_special_token_passthrough(self, ours):
        ids = ours.encode("hello </s> world")
        assert ours.eos_id in ids

    def test_viterbi_prefers_high_score_segmentation(self):
        # 'ab' piece scores higher than a+b -> must win
        pieces = [
            ("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2),
            ("▁", -5.0, 1), ("a", -3.0, 1), ("b", -3.0, 1), ("ab", -4.0, 1),
        ]
        m = T5Tokenizer(pieces)
        ids = m.encode("ab")
        names = [m.piece_of[i] for i in ids]
        assert names == ["▁", "ab"]


class TestFullCallSurface:
    """__call__ (padding / truncation / eos) vs transformers' fast wrapper
    around the identical tokenizer object."""

    @pytest.fixture(scope="class")
    def pair(self):
        transformers = pytest.importorskip("transformers")
        from tokenizers.processors import TemplateProcessing

        tok = _oracle_tokenizer()
        tok.post_processor = TemplateProcessing(
            single="$A </s>", special_tokens=[("</s>", 1)]
        )
        fast = transformers.PreTrainedTokenizerFast(
            tokenizer_object=tok,
            pad_token="<pad>", eos_token="</s>", unk_token="<unk>",
        )
        return T5Tokenizer(PIECES, max_length=24), fast

    @pytest.mark.parametrize(
        "text", ["hello world", "a serene mountain lake at dawn, photograph",
                 "the " * 40]  # forces truncation at max_length=24
    )
    def test_call_matches_fast(self, pair, text):
        ours, fast = pair
        got = ours([text], max_length=24)
        want = fast(
            [text], padding="max_length", max_length=24, truncation=True,
            return_tensors="np",
        )
        np.testing.assert_array_equal(got["input_ids"], want["input_ids"])
        np.testing.assert_array_equal(
            got["attention_mask"], want["attention_mask"]
        )

    def test_eos_survives_truncation(self, pair):
        ours, _ = pair
        ids = ours(["the " * 60], max_length=16)["input_ids"][0]
        assert ids[-1] == ours.eos_id
        assert len(ids) == 16


class TestTokenizerJson:
    def test_from_tokenizer_json(self, tmp_path):
        spec = {
            "model": {
                "type": "Unigram",
                "unk_id": 2,
                "vocab": [[p, s] for p, s, _ in PIECES],
            },
            "added_tokens": [
                {"id": 0, "content": "<pad>", "special": True},
                {"id": 1, "content": "</s>", "special": True},
            ],
        }
        path = tmp_path / "tokenizer.json"
        path.write_text(json.dumps(spec))
        tok = T5Tokenizer.from_pretrained(str(tmp_path))
        ref = T5Tokenizer(PIECES)
        for text in TEXTS[:6]:
            assert tok.encode(text) == ref.encode(text)
