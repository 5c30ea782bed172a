"""Prompt datasets and collators."""

from tpdm_tpu.data.datasets import (
    DummyPromptDataset,
    JsonlPromptDataset,
    WebDatasetPrompts,
)
from tpdm_tpu.data.collate import json_prompt_collate, webdataset_prompt_collate

__all__ = [
    "DummyPromptDataset",
    "JsonlPromptDataset",
    "WebDatasetPrompts",
    "json_prompt_collate",
    "webdataset_prompt_collate",
]
