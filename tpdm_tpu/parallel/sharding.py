"""Parameter and batch sharding rules (GSPMD PartitionSpecs).

ZeRO-3/FSDP analogue for the frozen towers (reference consumed DeepSpeed
stage-3 JSON configs, configs/deepspeed/deepspeed_stage_3.json:12-21):
kernels are sharded over "fsdp"; Megatron-style column/row splits go over
"tensor". Specs are GSPMD *hints* — XLA propagates and inserts the
all-gathers/reduce-scatters, which replaces both NCCL and the reference's
FSDP `summon_full_params` wrappers (modeling_sd3_pnt.py:798-802).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel producers: out-dim over "tensor", in-dim over "fsdp".
# Covers MMDiT, the SD1.5 UNet attention (same to_q/to_k/to_v naming), and
# FLUX (img/txt_mlp_0 producers, the single-stream fused qkv+mlp linear1).
_COLUMN = re.compile(
    r"(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj|proj_in|linear_1"
    r"|context_embedder|img_mlp_0|txt_mlp_0|linear1/)"
)
# row-parallel consumers: in-dim over "tensor"; the out-dim's second shard
# axis is mesh-dependent (see mmdit_param_specs): "fsdp" on tensor-trivial
# meshes (pure ZeRO), "data" when tensor>1 — the combination
# col=(fsdp,tensor) + row=(tensor,fsdp) + batch over (data,fsdp) MISCOMPILES
# in the XLA SPMD partitioner (numerically wrong outputs once per-shard
# batch >= 2; verified on the CPU backend, tests/test_parallel.py
# test_sharded_forward_matches_unsharded b=8 leg — same bug class as the
# _MODULATION carve-out below). row=(tensor,data) is exact and keeps the
# kernels sharded tensor*data ways.
_ROW = re.compile(
    r"(to_out|to_add_out|ff(_context)?/proj_out|linear_2"
    r"|img_attn_proj|txt_attn_proj|img_mlp_2|txt_mlp_2|linear2/)"
)
# AdaLN modulation producers: weight-shard over fsdp only. Their outputs are
# per-sample vectors consumed by every tensor shard (split into 6/9 chunks
# then broadcast), so tensor-sharding the out-dim buys nothing — and the
# combination (tensor-sharded modulations + batch over (data, fsdp) + other
# sharded kernels) miscompiles on the CPU SPMD backend (verified numerically;
# singles fine, pairs wrong). Keep them P("fsdp", None).
_MODULATION = re.compile(
    r"(norm1(_context)?/linear|norm_out/linear"
    r"|(img_mod|txt_mod|modulation|final_mod)/lin/)"
)


def _path_str(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def mmdit_param_spec(path, leaf, row_spec: P = P("tensor", "data")) -> P:
    """PartitionSpec for one MMDiT parameter leaf."""
    name = _path_str(path)
    if name.endswith("kernel_scale"):
        # quantization scales: int8's are 1-D (out,), group-int4's are 2-D
        # (in/group, out) — 1/64 of the int4 kernel's bytes. Replicate:
        # they're consumed alongside every kernel shard, and giving the
        # 2-D ones the kernel ladder's specs breaks on the (1, out) toy
        # shapes and courts the partitioner-bug class above for ~no memory.
        return P()
    if leaf.ndim == 2:
        if _MODULATION.search(name):
            return P("fsdp", None)
        if _COLUMN.search(name):
            return P("fsdp", "tensor")
        if _ROW.search(name):
            return row_spec
        if leaf.shape[0] >= 256 and leaf.shape[1] >= 256:
            return P("fsdp", None)  # misc large kernels: plain weight shard
        return P()
    if leaf.ndim == 4 and leaf.shape[-1] >= 256 and leaf.shape[-2] >= 64:
        # large conv kernels (HWIO): ZeRO-shard the output-feature dim over
        # fsdp — the UNet/VAE weight-memory analogue of the 2D weight shard
        # (SD1.5's 320-1280ch convs; XLA all-gathers per-op like the rest)
        return P(None, None, None, "fsdp")
    # biases / norm scales / pos tables: replicate (tiny)
    return P()


def row_parallel_spec(mesh: Optional[Mesh]) -> P:
    """Out-dim shard axis for row-parallel kernels, mesh-dependent (see the
    _ROW miscompile note above): ZeRO over fsdp ONLY when the mesh is known
    to have a trivial tensor axis, else over data. Unknown mesh (None)
    defaults to the SAFE (tensor, data) spec — a caller that later
    device_puts onto a tensor>1 mesh must never inherit the miscompiling
    combination. With tensor>1 and data==1 the row kernels end up
    replicated across fsdp — the price of dodging the partitioner bug."""
    if mesh is not None and mesh.shape.get("tensor", 1) == 1:
        return P("tensor", "fsdp")
    return P("tensor", "data")


def mmdit_param_specs(params, mesh: Optional[Mesh] = None) -> Any:
    """Tree of PartitionSpecs matching an MMDiT param tree."""
    row = row_parallel_spec(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda p, l: mmdit_param_spec(p, l, row_spec=row), params
    )


def shard_params(params, mesh: Mesh, specs=None):
    """device_put the param tree with its sharding specs onto the mesh."""
    if specs is None:
        specs = mmdit_param_specs(params, mesh)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def batch_spec(ndim: int) -> P:
    """Batch arrays shard their leading axis over (data, fsdp) — FSDP is
    data-parallel compute with sharded weights."""
    return P(("data", "fsdp"), *([None] * (ndim - 1)))


def shard_batch(tree, mesh: Mesh):
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, batch_spec(leaf.ndim))
        ),
        tree,
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree
    )
