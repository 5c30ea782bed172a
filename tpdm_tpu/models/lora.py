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
