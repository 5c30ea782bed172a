"""Batch collators (reference: src/data/data_collator.py)."""

from __future__ import annotations

from typing import Sequence


def json_prompt_collate(rows: Sequence[dict]) -> dict:
    """rows -> {"prompt": [...]}, stripping the leading "The image shows "
    (parity: json_prompt_collate_fn, data_collator.py:48-52)."""
    prompts = []
    for r in rows:
        p = r["prompt"]
        if p.startswith("The image shows "):
            p = p[len("The image shows "):]
        prompts.append(p)
    return {"prompt": prompts}


def webdataset_prompt_collate(
    rows: Sequence[dict], caption_keys: Sequence[str] = ("caption",)
) -> dict:
    """Extract caption key(s) from sample["json"]
    (parity: webdataset_prompt_collate_fn, data_collator.py:38-45)."""
    prompts = []
    for r in rows:
        payload = r["json"]
        for key in caption_keys:
            if key in payload:
                prompts.append(payload[key])
                break
        else:
            raise KeyError(f"none of {caption_keys} in sample")
    return {"prompt": prompts}
