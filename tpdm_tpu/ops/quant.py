"""int8 matmul path for the frozen towers (opt-in, inference-oriented).

v5e's MXU runs int8 at 2x bf16 throughput; measured on-chip: the SD3 FF
matmul shape gains ~1.2x end-to-end including dynamic activation
quantization (docs/PERF.md). Weights are symmetric per-output-channel int8;
activations quantize dynamically per-row (token) — the standard W8A8
dynamic scheme. Everything stays inside jit; no calibration pass needed.

This is a deliberate capability the reference lacks entirely (it runs fp16
end-to-end); quality impact must be validated per-checkpoint, so it is off
by default.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    """Per-output-channel symmetric int8 weights."""

    kernel_q: jax.Array  # (in, out) int8
    scale: jax.Array  # (out,) float32: w = kernel_q * scale
    bias: jax.Array | None


def quantize_weight(kernel: jax.Array, bias=None) -> QuantizedLinear:
    """fp kernel (in, out) -> per-out-channel symmetric int8."""
    k32 = kernel.astype(jnp.float32)
    scale = jnp.clip(jnp.max(jnp.abs(k32), axis=0), 1e-8) / 127.0
    q = jnp.clip(jnp.round(k32 / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantizedLinear(q, scale, bias)


W4_GROUP = 128


def _w4_group(in_features: int, group: int = W4_GROUP) -> int:
    """Group size for int4 quantization of an (in, out) kernel: W4_GROUP
    when it divides the contraction dim, else the whole column (tiny/toy
    layers)."""
    if in_features >= group and in_features % group == 0:
        return group
    return in_features


def quantize_weight_w4(
    kernel: jax.Array, bias=None, group: int = W4_GROUP
) -> QuantizedLinear:
    """fp kernel (in, out) -> group-wise symmetric int4.

    Per-(input-group, output-channel) scales — the standard weight-only
    4-bit scheme (per-out-channel alone is too coarse at 4 bits): scale
    shape (in/group, out), q in [-7, 7]. The 2-D scale is also how the
    rest of the stack tells w4 from w8/W8A8 trees (scale ndim 2 vs 1)."""
    in_f, out_f = kernel.shape
    g = _w4_group(in_f, group)
    k32 = kernel.astype(jnp.float32).reshape(in_f // g, g, out_f)
    scale = jnp.clip(jnp.max(jnp.abs(k32), axis=1), 1e-8) / 7.0
    q = jnp.clip(jnp.round(k32 / scale[:, None, :]), -7, 7)
    return QuantizedLinear(
        q.astype(jnp.int4).reshape(in_f, out_f), scale, bias
    )


def w4_matmul(x: jax.Array, qw: QuantizedLinear) -> jax.Array:
    """y = x @ dequant4(W) (+ b): int4 weight storage, fp compute.

    Weight HBM traffic/capacity is 1/4 of bf16 (XLA packs s4 two per
    byte on TPU); the group-wise dequant fuses into the dot's operand
    read like w8_matmul's."""
    in_f, out_f = qw.kernel_q.shape
    g = in_f // qw.scale.shape[0]
    w = (
        qw.kernel_q.astype(x.dtype).reshape(in_f // g, g, out_f)
        * qw.scale[:, None, :].astype(x.dtype)
    ).reshape(in_f, out_f)
    y = x @ w
    if qw.bias is not None:
        y = y + qw.bias.astype(x.dtype)
    return y


def w8_matmul(x: jax.Array, qw: QuantizedLinear) -> jax.Array:
    """y = x @ dequant(W) (+ b): int8 weight STORAGE, fp compute.

    The dequant (int8 -> x.dtype, times per-channel scale) fuses into the
    dot's operand read under XLA, so the matmul pays half the weight HBM
    traffic of bf16 storage with full-precision activations — the right
    mode for numerics-sensitive layers whose compute is negligible (e.g.
    FLUX modulation projections: (b, d) @ (d, 6d) at b<=2 is pure weight
    streaming).
    """
    w = qw.kernel_q.astype(x.dtype) * qw.scale[None, :].astype(x.dtype)
    y = x @ w
    if qw.bias is not None:
        y = y + qw.bias.astype(x.dtype)
    return y


def int8_dynamic_matmul(x: jax.Array, qw: QuantizedLinear) -> jax.Array:
    """y = x @ W (+ b) with W int8 and x dynamically quantized per row.

    x: (..., in); returns (..., out) in x.dtype.
    """
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    x32 = x2.astype(jnp.float32)
    x_scale = jnp.clip(jnp.max(jnp.abs(x32), axis=1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qw.kernel_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * qw.scale[None, :]
    if qw.bias is not None:
        y = y + qw.bias.astype(jnp.float32)[None, :]
    return y.astype(x.dtype).reshape(orig_shape[:-1] + (qw.kernel_q.shape[1],))


class DenseMaybeQuant(nn.Module):
    """Drop-in Dense that runs W8A8-dynamic when `quant` is on.

    Parameters stay fp (so converters/checkpoints are unchanged); the int8
    weight + scale are derived inside jit. NOTE: because params are jit
    ARGUMENTS, the weight quantization re-runs every call — measured
    end-to-end this currently cancels the MXU gain (docs/PERF.md); the
    production win needs pre-quantized int8 param trees (roadmap). Numerics
    are tested; the flag is off by default.
    """

    features: int
    quant: bool = False
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # False = weight-only int8 (w8_matmul): int8 storage, fp compute — for
    # layers where activation quantization is numerically risky and the
    # matmul is weight-streaming-bound anyway (FLUX modulations).
    act_quant: bool = True
    # 8 = int8 (W8A8 or w8 per act_quant); 4 = group-wise int4, ALWAYS
    # weight-only (no int4 MXU path on this toolchain) — the capacity
    # mode: 4x smaller weights than bf16.
    bits: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if not self.quant:
            if kernel.dtype in (jnp.int8, jnp.int4):
                raise ValueError(
                    "prequantized kernel given to a non-quant Dense; "
                    "build the model with quant_matmuls=True or keep fp "
                    "params"
                )
            y = x @ kernel.astype(self.dtype)
            if bias is not None:
                y = y + bias.astype(self.dtype)
            return y
        # kernel_scale exists whenever quant is on; with a PRE-quantized
        # tree (prequantize_params) the kernel arrives int8/int4 and the
        # scale carries the real factors — no in-graph requantization.
        if self.bits == 4:
            g = _w4_group(x.shape[-1])
            scale = self.param(
                "kernel_scale",
                nn.initializers.ones,
                (x.shape[-1] // g, self.features),
            )
            if kernel.dtype == jnp.int4:
                qw = QuantizedLinear(kernel, scale.astype(jnp.float32), bias)
            else:
                qw = quantize_weight_w4(kernel, bias, group=g)
            return w4_matmul(x.astype(self.dtype), qw)
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,)
        )
        if kernel.dtype == jnp.int8:
            qw = QuantizedLinear(kernel, scale.astype(jnp.float32), bias)
        else:
            qw = quantize_weight(kernel, bias)
        if not self.act_quant:
            return w8_matmul(x.astype(self.dtype), qw)
        return int8_dynamic_matmul(x.astype(self.dtype), qw)


def prequantize_params(params):
    """Convert every quantizable Dense in a param tree to stored int.

    Walks the tree; wherever a module dict holds both "kernel" (2D float)
    and "kernel_scale" (created by DenseMaybeQuant(quant=True)), the
    kernel is replaced by its quantization and the scale filled in. The
    MODE is inferred from the scale the model created: 1-D scale =
    per-out-channel int8 (bits=8); 2-D scale = group-wise int4 (bits=4,
    group = in/scale.shape[0]). Do this ONCE after loading/converting
    weights; the resulting tree makes `quant_matmuls=True` models skip
    in-graph weight requantization (the measured end-to-end blocker,
    docs/PERF.md).
    """
    def walk(node):
        if not isinstance(node, dict):
            return node
        if (
            "kernel" in node
            and "kernel_scale" in node
            and getattr(node["kernel"], "ndim", 0) == 2
            and node["kernel"].dtype not in (jnp.int8, jnp.int4)
        ):
            k = jnp.asarray(node["kernel"])
            if getattr(node["kernel_scale"], "ndim", 1) == 2:
                g = k.shape[0] // node["kernel_scale"].shape[0]
                q = quantize_weight_w4(k, group=g)
            else:
                q = quantize_weight(k)
            out = dict(node)
            out["kernel"] = q.kernel_q
            out["kernel_scale"] = q.scale
            return out
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


def fit_quant_params(params, expected_shapes):
    """Fit a CONVERTED (float, scale-less) param tree into a
    quant_matmuls=True model's structure.

    Checkpoint converters produce plain {kernel, bias} modules; a
    DenseMaybeQuant(quant=True) model additionally expects a
    "kernel_scale" leaf per quantized Dense. Walk the model's
    ``jax.eval_shape(init, ...)`` tree and insert unit scales wherever the
    converted tree lacks them — then ``prequantize_params`` fills the real
    per-channel factors. Raises on any other structural mismatch so a bad
    conversion fails loudly.
    """
    def walk(p, e, path):
        if isinstance(e, dict):
            if not isinstance(p, dict):
                raise ValueError(f"param tree mismatch at {path}: "
                                 f"expected a module dict")
            out = {}
            for k, v in e.items():
                if k == "kernel_scale" and k not in p:
                    out[k] = jnp.ones(v.shape, v.dtype)
                elif k not in p:
                    raise ValueError(f"missing param {path + (k,)}")
                else:
                    out[k] = walk(p[k], v, path + (k,))
            return out
        return p

    return walk(params, expected_shapes, ())
