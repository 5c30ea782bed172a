"""Time Prediction Module (TPM) — the only trainable network in TPDM.

Parity with the reference `TimePredictor`
(reference: src/models/stable_diffusion_3/modeling_sd3_pnt.py:85-126): two
3x3 convs (stride 1 then 2) with an AdaGroupNorm conditioned on temb between
them, adaptive avg-pool to 16x16, adaptive max-pool to 1x1, then a 2-layer
MLP whose exp()+epsilon output yields Beta parameters (alpha, beta) > 1.

TPU-native: convs run NHWC (the native TPU conv layout); the public API
takes the reference's NCHW activation tensor and transposes once on entry.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpdm_tpu.models.layers import GroupNorm


def adaptive_avg_pool_2d(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch `adaptive_avg_pool2d` parity over NHWC input, any spatial size.

    Bin i covers rows [floor(i·H/O), ceil((i+1)·H/O)); bin means are computed
    exactly via integral images with statically unrolled boundaries (the
    output size is a compile-time constant, so this stays jit-friendly).
    """
    b, h, w, c = x.shape

    def bounds(size, out):
        return [
            (math.floor(i * size / out), math.ceil((i + 1) * size / out))
            for i in range(out)
        ]

    cs = jnp.cumsum(jnp.cumsum(x, axis=1), axis=2)
    cs = jnp.pad(cs, ((0, 0), (1, 0), (1, 0), (0, 0)))
    rows = bounds(h, out_h)
    cols = bounds(w, out_w)
    out = []
    for s0, e0 in rows:
        row = []
        for s1, e1 in cols:
            area = (e0 - s0) * (e1 - s1)
            total = (
                cs[:, e0, e1] - cs[:, s0, e1] - cs[:, e0, s1] + cs[:, s0, s1]
            )
            row.append(total / area)
        out.append(jnp.stack(row, axis=1))
    return jnp.stack(out, axis=1)  # (b, out_h, out_w, c)


def reshape_tokens_to_2d(
    tokens: jax.Array, height: int = 64, width: int = 64, patch_size: int = 2
) -> jax.Array:
    """(b, n_tokens, c) -> (b, c, height, width) spatial activation map.

    Exact replica of the reference's `reshape_hidden_states_to_2d`
    (modeling_sd3_pnt.py:33-54) including its token-axis (h', w', p, q)
    interpretation — the TPM was trained against this exact arrangement, so
    converted checkpoints require it bit-for-bit.
    """
    b, n, c = tokens.shape
    gh, gw = height // patch_size, width // patch_size
    x = tokens.reshape(b, gh, gw, patch_size, patch_size, c)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(b, c, height, width)


class AdaGroupNormZeroSingle(nn.Module):
    """GroupNorm(1 group) with temb-conditioned scale/shift.

    Parity: `CustomAdaGroupNormZeroSingle` (modeling_sd3_pnt.py:56-83);
    chunk order is (shift, scale).
    """

    input_dim: int  # temb width
    embedding_dim: int  # channel count of x
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        """x: (b, h, w, c) NHWC; emb: (b, input_dim)."""
        mod = nn.Dense(2 * self.embedding_dim, dtype=self.dtype, name="linear")(
            nn.silu(emb)
        )
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = GroupNorm(num_groups=1, num_channels=self.embedding_dim, name="norm")(x)
        return x * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]


class TimePredictor(nn.Module):
    """Predicts Beta(alpha, beta) decay-ratio parameters from activations.

    Args mirror the reference ctor (modeling_sd3_pnt.py:86): SD3 uses
    in_channels = 2*1536, epsilon=1.0; SD1.5 uses in_channels = 2*320
    (modeling_sd_v1_5.py:73-131, epsilon 1.0 as well).

    Init parity (:117-126): conv/linear weights ~ N(0, 0.02); conv and fc1
    biases zero; fc2 bias = (init_alpha, init_beta). (The reference leaves
    the norm's linear bias at torch's default fan-in uniform init; we use
    zeros — both are training-from-scratch inits of a bias that multiplies
    into (1+scale), with no behavioral significance.)
    """

    conv_out_channels: int = 128
    in_channels: int = 1536 * 2
    temb_dim: int = 1536
    projection_dim: int = 2
    init_alpha: float = 1.5
    init_beta: float = 0.5
    epsilon: float = 1.0
    dtype: jnp.dtype = jnp.float32
    # Collapse guard (None keeps reference exp() parity): smoothly bound
    # alpha/beta at epsilon + param_cap. Once an RLOO policy collapses to
    # the 1-step optimum, unbounded exp() heads blow past fp32 range at
    # the ratio-clamp boundary, every subsequent update NaN-skips, and
    # learning silently stops (observed: docs/learning_curve_sd3.json
    # updates 23-30, all skipped — the reference's own NaN guard,
    # rloo_trainer.py:497-523, has the same blind spot). Bounding the
    # params floors the policy's entropy instead.
    param_cap: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        """x: (b, in_channels, H, W) NCHW activation map; temb: (b, temb_dim).

        Returns (b, 2): (alpha, beta), each > epsilon.
        """
        w_init = nn.initializers.normal(stddev=0.02)
        x = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC for TPU convs

        x = nn.Conv(
            self.conv_out_channels,
            (3, 3),
            padding=1,
            kernel_init=w_init,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = AdaGroupNormZeroSingle(
            self.temb_dim, self.conv_out_channels, dtype=self.dtype, name="norm1"
        )(x, temb)
        x = nn.silu(x)
        x = nn.Conv(
            self.conv_out_channels,
            (3, 3),
            strides=2,
            padding=1,
            kernel_init=w_init,
            dtype=self.dtype,
            name="conv2",
        )(x)

        # adaptive_avg_pool2d to 16x16 then adaptive_max_pool2d to 1x1
        # (modeling_sd3_pnt.py:110-111). For the SD3 64x64 input the
        # post-conv2 map is 32x32 -> exact 2x2 means, then a global max.
        x = adaptive_avg_pool_2d(x, 16, 16)
        x = x.max(axis=(1, 2))  # (b, c)

        x = nn.silu(
            nn.Dense(128, kernel_init=w_init, dtype=self.dtype, name="fc1")(x)
        )
        head_bias = nn.initializers.constant(
            jnp.array([self.init_alpha, self.init_beta])
        )
        x = nn.Dense(
            self.projection_dim,
            kernel_init=w_init,
            bias_init=head_bias,
            dtype=self.dtype,
            name="fc2",
        )(x)
        x = x.astype(jnp.float32)
        if self.param_cap is not None:
            # cap*sigmoid(x - log cap) == exp(x) to first order while
            # exp(x) << cap, saturating at the cap: same policy where it
            # matters, finite everywhere
            cap = float(self.param_cap)
            return self.epsilon + cap * jax.nn.sigmoid(x - jnp.log(cap))
        return jnp.exp(x) + self.epsilon
