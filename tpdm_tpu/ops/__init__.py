"""Core math ops: Beta distribution, reference schedules, flow solvers."""

from tpdm_tpu.ops.beta import (
    beta_entropy,
    beta_kl,
    beta_log_prob,
    beta_mean,
    beta_mode,
    beta_sample,
    mode_concentration_to_alpha_beta,
)
from tpdm_tpu.ops.flow_euler import flow_euler_step
from tpdm_tpu.ops.flow_solver import flow_ab2_step, flow_heun_combine
from tpdm_tpu.ops.schedules import get_ref_beta, uniform_flow_sigmas

__all__ = [
    "beta_entropy",
    "beta_kl",
    "beta_log_prob",
    "beta_mean",
    "beta_mode",
    "beta_sample",
    "mode_concentration_to_alpha_beta",
    "flow_euler_step",
    "flow_ab2_step",
    "flow_heun_combine",
    "get_ref_beta",
    "uniform_flow_sigmas",
]
