"""Tensor-parallel attention: shard_map over the "tensor" mesh axis.

Pallas kernels are opaque custom calls to GSPMD — under plain `jit` with
head-sharded q/k/v, XLA would all-gather the heads before the kernel. The
fix is `shard_map`: each device runs the flash kernel on its local head
shard (attention is embarrassingly parallel over heads; no collectives
needed inside). Use this around the MMDiT's attention when running real
multi-chip tensor parallelism; the jnp reference path needs no wrapping
(GSPMD partitions einsums natively).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from tpdm_tpu.ops.attention import attention_reference, flash_attention


def make_tp_attention(
    mesh: Mesh,
    axis: str = "tensor",
    kv_len: Optional[int] = None,
    use_pallas: bool = True,
    batch_axes: tuple = ("data", "fsdp"),
):
    """Build attention fn with heads sharded over `axis` and batch over
    `batch_axes`. q,k,v: (b, h, n, d) with h divisible by mesh[axis].
    """
    present = tuple(a for a in batch_axes if a in mesh.axis_names)
    spec = P(present if present else None, axis, None, None)

    def local_attention(q, k, v):
        if use_pallas:
            return flash_attention(q, k, v, kv_len)
        return attention_reference(q, k, v, kv_len)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        # pallas_call out_shapes carry no vma metadata on this jax version
        check_vma=False,
    )
    def tp_attention(q, k, v):
        return local_attention(q, k, v)

    return tp_attention
