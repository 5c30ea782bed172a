"""Per-sample-sigma Euler step for rectified flow, in fp32.

The core primitive that lets every batch element follow its own adaptive
schedule: x_{next} = x + (sigma_next − sigma)·v, computed in float32 and cast
back. Parity with the reference `custom_step`
(src/models/model_utilis.py:52-74).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_euler_step(
    model_output: jax.Array,
    sigma_next: jax.Array,
    sigma: jax.Array,
    sample: jax.Array,
) -> jax.Array:
    """One Euler flow step with per-sample continuous sigmas.

    Args:
        model_output: predicted velocity, shape (b, ...) any layout.
        sigma_next: next noise level per sample, shape (b,).
        sigma: current noise level per sample, shape (b,).
        sample: current latents, shape (b, ...).

    Returns:
        next latents, same shape/dtype as `model_output`.
    """
    out_dtype = model_output.dtype
    delta = (sigma_next - sigma).astype(jnp.float32)
    delta = delta.reshape(delta.shape + (1,) * (sample.ndim - 1))
    prev = sample.astype(jnp.float32) + delta * model_output.astype(jnp.float32)
    return prev.astype(out_dtype)
