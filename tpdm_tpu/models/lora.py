"""LoRA adapters over frozen backbone params (pure pytree transforms).

The reference trains ONLY the 7M-param TPM and keeps every backbone
weight frozen (modeling_sd3_pnt.py:760-763). These helpers extend the
framework past that boundary without giving up the frozen-tree design:
a LoRA tree holds rank-r factors for selected 2-D kernels, and
`apply_lora` produces merged params functionally — the base tree is
never mutated, gradients flow only into the factors, and the merge is
jit/GSPMD-friendly (a tree map of (in,r)@(r,out) matmuls; under a mesh
the tiny factors replicate while the merged kernel inherits the base
kernel's sharding).

Used by train/draft.py (reward-gradient fine-tuning, the training mode
the reference's own differentiable `score_gard` path anticipates —
ImageReward.py:87-103 — but never wires up).

Convention: B (the "b" factor) is zero-initialized, so a freshly created
LoRA is an EXACT identity — merged params equal base params bitwise.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import tree_util

__all__ = [
    "default_match",
    "init_lora",
    "apply_lora",
    "lora_param_count",
    "stack_adapters",
    "lora_interceptor",
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def default_match(path_str: str, leaf) -> bool:
    """All 2-D dense kernels (attention qkv/out, MLPs, adaLN projections).

    Conv kernels (4-D) and norm scales/biases (1-D) are excluded — the
    standard LoRA target set."""
    return getattr(leaf, "ndim", 0) == 2 and path_str.endswith("kernel")


def init_lora(
    params,
    rank: int,
    key: jax.Array,
    match: Optional[Callable[[str, jax.Array], bool]] = None,
    dtype=jnp.float32,
) -> dict:
    """Build a LoRA tree for `params`: {path: {"a": (in, r), "b": (r, out)}}.

    "a" ~ N(0, 1/in_dim) and "b" = 0 (standard LoRA init): the adapter
    starts as an exact identity and the first gradient step flows through
    d/db = aᵀ·dW. Factors are fp32 regardless of the (often bf16) base —
    the optimizer state wants full precision; `apply_lora` casts the
    merged delta back to the base dtype.
    """
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    match = match or default_match
    leaves = tree_util.tree_flatten_with_path(params)[0]
    lora = {}
    for path, leaf in leaves:
        ps = _path_str(path)
        if not match(ps, leaf):
            continue
        d_in, d_out = leaf.shape
        key, sub = jax.random.split(key)
        lora[ps] = {
            "a": (jax.random.normal(sub, (d_in, rank), dtype)
                  / jnp.sqrt(jnp.asarray(d_in, dtype))),
            "b": jnp.zeros((rank, d_out), dtype),
        }
    if not lora:
        raise ValueError("no parameters matched the LoRA target predicate")
    return lora


def apply_lora(params, lora: dict, scale: float = 1.0):
    """Merged params: kernel + scale * (a @ b), cast to the kernel dtype.

    Pure and differentiable wrt both operands; everything not in `lora`
    passes through by reference (no copy)."""

    def merge(path, leaf):
        fac = lora.get(_path_str(path))
        if fac is None:
            return leaf
        delta = (fac["a"] @ fac["b"]) * scale
        return leaf + delta.astype(leaf.dtype)

    return tree_util.tree_map_with_path(merge, params)


def lora_param_count(lora: dict) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(lora))


def stack_adapters(adapters: dict) -> tuple:
    """Stack named adapters into a per-key factor BANK for batched
    (per-sample) application — the fused multi-tenant serving path.

    adapters: {name: (lora_tree, scale)}. Returns (bank, name_to_id):

    - bank: {param_key: {"a": (n+1, d_in, r_max), "b": (n+1, r_max, d_out)}}
      over the UNION of every adapter's keys. Row 0 is the base model
      (all-zero factors — an exact no-op delta); row name_to_id[name]
      holds that adapter's factors, right-padded with zero rank columns
      to r_max and with `scale` folded into "b" so application needs no
      per-name scalars.
    - name_to_id: {name: int >= 1}.

    With per-sample ids (b,) int32, the delta for a dense layer is
    ``(x @ a[ids]) @ b[ids]`` — rank-r_max batched matmuls, ~r/d of the
    dense layer's FLOPs — which lets ONE compiled program serve any mix
    of adapters across the batch (see serving_continuous.register_adapter
    fused mode). Contrast apply_lora: full merged weight copy per
    adapter, one adapter per program invocation.
    """
    if not adapters:
        raise ValueError("no adapters to stack")
    names = sorted(adapters)
    name_to_id = {n: i + 1 for i, n in enumerate(names)}
    keys = sorted({k for lora, _ in adapters.values() for k in lora})
    n = len(names) + 1
    bank = {}
    for key in keys:
        # shapes/rank may differ per adapter: take the union geometry
        d_in = d_out = r_max = None
        for lora, _ in adapters.values():
            fac = lora.get(key)
            if fac is None:
                continue
            a, b = jnp.asarray(fac["a"]), jnp.asarray(fac["b"])
            if d_in is None:
                d_in, d_out = a.shape[0], b.shape[1]
            elif (a.shape[0], b.shape[1]) != (d_in, d_out):
                raise ValueError(f"adapter shape mismatch at {key}")
            r_max = a.shape[1] if r_max is None else max(r_max, a.shape[1])
        A = jnp.zeros((n, d_in, r_max), jnp.float32)
        B = jnp.zeros((n, r_max, d_out), jnp.float32)
        for name in names:
            lora, scale = adapters[name]
            fac = lora.get(key)
            if fac is None:
                continue
            i = name_to_id[name]
            r = jnp.asarray(fac["a"]).shape[1]
            A = A.at[i, :, :r].set(jnp.asarray(fac["a"], jnp.float32))
            B = B.at[i, :r, :].set(
                jnp.asarray(fac["b"], jnp.float32) * float(scale)
            )
        bank[key] = {"a": A, "b": B}
    return bank, name_to_id


def lora_interceptor(bank: dict, row_ids):
    """A flax `nn.intercept_methods` interceptor adding per-ROW LoRA
    deltas from a `stack_adapters` bank to every matching dense layer.

    row_ids: (b,) int32 — bank row per batch element of the wrapped
    apply (0 = base, an exact zero delta). Targets the same layers the
    merged path (`apply_lora` + default_match) rewrites: 2-D `kernel`
    modules — `nn.Dense` and the framework's `DenseMaybeQuant` — keyed
    by their param path. Usage::

        with nn.intercept_methods(lora_interceptor(bank, ids)):
            model.apply(params, *args)

    The delta math is fp32 (the factors' dtype) regardless of the
    (usually bf16) activation dtype, then cast to the layer output dtype
    — the batched analogue of apply_lora's merge-then-cast. Numerics vs
    the merged path differ by bf16 rounding of the weight sum (merged
    rounds W+Δ once; fused rounds the two matmul outputs), at most a
    few output ulps.
    """
    import flax.linen as nn

    from tpdm_tpu.ops.quant import DenseMaybeQuant

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        mod = context.module
        if context.method_name == "__call__" and isinstance(
            mod, (nn.Dense, DenseMaybeQuant)
        ):
            key = "params/" + "/".join(mod.path) + "/kernel"
            entry = bank.get(key)
            if entry is not None:
                x = jnp.asarray(args[0], entry["a"].dtype)
                a = entry["a"][row_ids]  # (b, d_in, r)
                b = entry["b"][row_ids]  # (b, r, d_out)
                # rank-r einsums are ~r/d of the dense FLOPs: run them at
                # HIGHEST precision (default-precision f32 matmuls are
                # bf16-grade on both TPU MXU and this XLA:CPU) so the only
                # deviation from the merged path is the base matmul's own
                # rounding of W vs W+Δ
                hp = jax.lax.Precision.HIGHEST
                if x.ndim == 2:
                    delta = jnp.einsum("bd,bdr->br", x, a, precision=hp)
                    delta = jnp.einsum("br,bro->bo", delta, b, precision=hp)
                elif x.ndim == 3:
                    delta = jnp.einsum("bld,bdr->blr", x, a, precision=hp)
                    delta = jnp.einsum("blr,bro->blo", delta, b, precision=hp)
                else:
                    raise ValueError(
                        f"unsupported dense input rank {x.ndim} at {key}"
                    )
                out = out + delta.astype(out.dtype)
        return out

    return interceptor
