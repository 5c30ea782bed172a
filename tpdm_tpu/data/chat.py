"""Chat-template dataset + supervised collator (reference data parity).

The reference carries two LLM-era data components that its diffusion
launch path never touches (dead code, but part of its surface):
`JsonDataset` — json/jsonl files of chat messages, tokenized through the
tokenizer's chat template (reference: src/data/json_dataset.py:6-52) —
and `DataCollatorForSupervisedDataset` — right-padded input_ids with an
attention mask and -100-padded labels
(reference: src/data/data_collator.py:10-35).

TPU-native equivalents, tokenizer-agnostic: no transformers dependency —
the caller supplies `apply_template(messages) -> list[int]` (any of the
framework's native tokenizers can be adapted; a trivial template is
enough for tests). Arrays are numpy; the collator emits the static-shape
right-padded batch an XLA training step wants (pad to `pad_to_multiple`
so bucketed lengths reuse compiled programs instead of one shape per
batch max — the jit-cache analogue of torch's dynamic pad_sequence).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

IGNORE_LABEL = -100  # reference data_collator.py:30 (HF loss-mask value)


def _load_json_file(path: str) -> List[dict]:
    """One .json (a list) or .jsonl (one object per line) file.
    Parity: json_dataset.py:31-40, including the unsupported-format
    error."""
    if path.endswith(".jsonl"):
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    raise ValueError(f"Unsupported file format: {path}")


class JsonChatDataset:
    """Chat-message rows from a json/jsonl file or a directory of them.

    Args:
        data_path: one file, or a directory whose .json/.jsonl files are
            all loaded (reference: json_dataset.py:17-28).
        apply_template: (messages, add_generation_prompt) -> list[int]
            token ids — the chat-template hook the reference delegates to
            transformers' `apply_chat_template` (json_dataset.py:46-51).
        add_generation_prompt: forwarded to the template.
    """

    def __init__(
        self,
        data_path: str,
        apply_template: Callable[[object, bool], Sequence[int]],
        add_generation_prompt: bool = False,
    ):
        if os.path.isdir(data_path):
            files = sorted(
                os.path.join(data_path, f)
                for f in os.listdir(data_path)
                if f.endswith((".json", ".jsonl"))
            )
        else:
            files = [data_path]
        self.samples: List[dict] = []
        for f in files:
            self.samples.extend(_load_json_file(f))
        self.apply_template = apply_template
        self.add_generation_prompt = add_generation_prompt

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        ids = np.asarray(
            self.apply_template(
                self.samples[idx], self.add_generation_prompt
            ),
            np.int32,
        )
        return {
            "input_ids": ids,
            "attention_mask": np.ones_like(ids, bool),
        }


def collate_supervised(
    instances: Sequence[Dict],
    pad_id: int,
    max_length: Optional[int] = None,
    pad_to_multiple: int = 1,
) -> Dict[str, np.ndarray]:
    """Right-pad variable-length rows into one batch.

    Parity with DataCollatorForSupervisedDataset (data_collator.py:10-35):
    input_ids padded with `pad_id` then truncated to `max_length`,
    attention_mask = input_ids != pad_id, labels (when present) padded
    with IGNORE_LABEL. `pad_to_multiple` rounds the padded length up so
    XLA sees a few bucketed shapes instead of one per batch (static-shape
    discipline; the reference's torch pad_sequence is fully dynamic).
    """
    rows = [np.asarray(i["input_ids"]) for i in instances]
    n = max(r.shape[0] for r in rows)
    if max_length is not None:
        n = min(n, max_length)
    n = ((n + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple

    def pad_to(r, fill):
        r = r[:n]
        return np.pad(r, (0, n - r.shape[0]), constant_values=fill)

    input_ids = np.stack([pad_to(r, pad_id) for r in rows])
    batch = {
        "input_ids": input_ids.astype(np.int32),
        "attention_mask": input_ids != pad_id,
    }
    if "labels" in instances[0]:
        batch["labels"] = np.stack(
            [
                pad_to(np.asarray(i["labels"]), IGNORE_LABEL)
                for i in instances
            ]
        ).astype(np.int32)
    return batch
