"""Adaptive sampling loop and end-to-end generation pipeline."""

from tpdm_tpu.pipeline.sampler import (
    SampleOutput,
    SamplerConfig,
    adaptive_sample,
    fixed_schedule_sample,
    replay_logprobs,
)

__all__ = [
    "SampleOutput",
    "SamplerConfig",
    "adaptive_sample",
    "fixed_schedule_sample",
    "replay_logprobs",
]
