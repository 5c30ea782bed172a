"""Adaptive sampling loop and end-to-end generation pipeline."""

from tpdm_tpu.pipeline.sampler import (
    FLOW_SOLVERS,
    SampleOutput,
    SamplerConfig,
    adaptive_sample,
    fixed_schedule_sample,
    fixed_schedule_sample_solver,
    replay_logprobs,
    solver_nfe,
)

__all__ = [
    "FLOW_SOLVERS",
    "SampleOutput",
    "SamplerConfig",
    "adaptive_sample",
    "fixed_schedule_sample",
    "fixed_schedule_sample_solver",
    "replay_logprobs",
    "solver_nfe",
]
