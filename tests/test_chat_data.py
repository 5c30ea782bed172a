"""JsonChatDataset + collate_supervised (reference LLM-data parity,
src/data/json_dataset.py + data_collator.py — the last SURVEY §2 item
previously ported only partially)."""

import json

import numpy as np
import pytest

from tpdm_tpu.data.chat import (
    IGNORE_LABEL,
    JsonChatDataset,
    collate_supervised,
)


def _template(messages, add_generation_prompt):
    """Toy chat template: role/content words hashed to small ids, with a
    trailing generation marker when requested."""
    ids = []
    for m in messages:
        ids.append(1 if m["role"] == "user" else 2)
        ids.extend(3 + (abs(hash(w)) % 50) for w in m["content"].split())
    if add_generation_prompt:
        ids.append(99)
    return ids


ROWS = [
    [{"role": "user", "content": "hello there"}],
    [
        {"role": "user", "content": "a b c"},
        {"role": "assistant", "content": "d"},
    ],
]


class TestJsonChatDataset:
    def test_loads_json_jsonl_and_directories(self, tmp_path):
        (tmp_path / "a.json").write_text(json.dumps(ROWS))
        (tmp_path / "b.jsonl").write_text(
            "\n".join(json.dumps(r) for r in ROWS[:1])
        )
        (tmp_path / "ignored.txt").write_text("nope")
        ds = JsonChatDataset(str(tmp_path), _template)
        assert len(ds) == 3  # 2 from .json + 1 from .jsonl
        single = JsonChatDataset(str(tmp_path / "a.json"), _template)
        assert len(single) == 2
        item = single[1]
        assert item["input_ids"].dtype == np.int32
        assert item["attention_mask"].all()
        # both role markers present for the two-turn row
        assert 1 in item["input_ids"] and 2 in item["input_ids"]

    def test_generation_prompt_appends_marker(self, tmp_path):
        p = tmp_path / "a.jsonl"
        p.write_text(json.dumps(ROWS[0]))
        plain = JsonChatDataset(str(p), _template)[0]["input_ids"]
        gen = JsonChatDataset(
            str(p), _template, add_generation_prompt=True
        )[0]["input_ids"]
        assert gen.shape[0] == plain.shape[0] + 1 and gen[-1] == 99

    def test_unsupported_format_rejected(self, tmp_path):
        p = tmp_path / "a.txt"
        p.write_text("{}")
        with pytest.raises(ValueError, match="Unsupported file format"):
            JsonChatDataset(str(p), _template)


class TestCollateSupervised:
    def _rows(self):
        return [
            {"input_ids": np.arange(1, 4), "labels": np.arange(1, 4)},
            {"input_ids": np.arange(1, 8), "labels": np.arange(1, 8)},
        ]

    def test_pad_mask_labels(self):
        b = collate_supervised(self._rows(), pad_id=0)
        assert b["input_ids"].shape == (2, 7)
        np.testing.assert_array_equal(
            b["attention_mask"].sum(axis=1), [3, 7]
        )
        assert (b["labels"][0, 3:] == IGNORE_LABEL).all()
        assert (b["input_ids"][0, 3:] == 0).all()

    def test_max_length_truncates(self):
        b = collate_supervised(self._rows(), pad_id=0, max_length=5)
        assert b["input_ids"].shape == (2, 5)
        np.testing.assert_array_equal(b["input_ids"][1], np.arange(1, 6))

    def test_pad_to_multiple_buckets_shapes(self):
        """Static-shape discipline: bucketed lengths reuse one compiled
        program per bucket instead of one per batch max."""
        b = collate_supervised(self._rows(), pad_id=0, pad_to_multiple=8)
        assert b["input_ids"].shape == (2, 8)
        b2 = collate_supervised(
            [{"input_ids": np.arange(1, 3)}], pad_id=0, pad_to_multiple=8
        )
        assert b2["input_ids"].shape == (1, 8)
        assert "labels" not in b2
