"""Attention for the joint image+text sequence: Pallas TPU kernel + reference.

The MMDiT hot path is full (non-causal) attention over ~4429 tokens
(4096 image + 333 text) at head_dim 64. The reference leans on torch SDPA /
FusedJointAttnProcessor2_0 (reference:
src/models/stable_diffusion_3/transformer_sd3.py:28,279); here the forward
runs as a Pallas kernel that never materializes the (n, n) score matrix in
HBM: K/V stay resident in VMEM, a 128-row chunk of fp32 scores lives
on-chip, and softmax+PV run fused. The kernel works in TRANSPOSED layout
(query axis = lanes) so head_dim 64 doesn't half-fill the MXU output —
see _flash_kernel for the measured rationale.

Because the backbone is frozen in TPDM training (only the TPM gets
gradients), the backward pass is off the hot path: the resident kernel's
custom_vjp recomputes attention with the jnp reference for grads; the
streaming kernel (kv > 8k) uses a chunked two-pass backward
(`attention_backward_chunked`) that never materializes the n² scores, so
long sequences stay trainable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int] = None,
) -> jax.Array:
    """Plain jnp attention (fp32 softmax). q,k,v: (b, h, n, d)."""
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_len is not None and kv_len < k.shape[2]:
        mask = jnp.arange(k.shape[2]) < kv_len
        s = jnp.where(mask[None, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


_LOG2E = 1.4426950408889634


def _flash_kernel(qt_ref, k_ref, vt_ref, o_ref, *, kv_padded: int, chunk_kv: int):
    """One (batch·head, q-block) program in TRANSPOSED layout: the query
    axis is the LANE (last) dimension throughout, so both matmuls and the
    output keep all 128 lanes busy despite head_dim 64.

        S^T   = K_chunk · Q^T        (chunk_kv, n_block)
        acc^T = V^T_ext · P^T        (dv,       n_block)

    Why this layout (measured, v5e, 2×24×4480×64): the natural-layout
    kernel tops out at ~60 TF/s because the PV phase's OUTPUT is only
    d+1=65 lanes wide (half the MXU's 128) and the QK phase's contraction
    is 64-deep; transposing makes PV's output n_block lanes wide and turns
    QK into one (chunk,64)x(64,n_block) pass streaming thousands of lanes
    — 3.20 ms vs 4.12 ms, 77 TF/s (experiments/attn_round3{,b}.py).

    Carried tricks from the natural-layout kernel:
    - ones ROW in V^T (row d), zeroed on masked kv columns, so the softmax
      denominator falls out of the PV matmul;
    - q pre-scaled by log2(e)/sqrt(d) outside; exp2 in-kernel;
    - unrolled kv chunks (128 rows) let Mosaic overlap chunk t+1's QK^T
      with chunk t's exp2/PV.

    Masking needs NO in-kernel iota: _prep_transposed augments the
    contraction dimension with a bias row/column that drives masked rows'
    scores to -1e9 (true -inf semantics — see its docstring for why
    zeroing alone would NaN).
    """
    acc, m = _chunk_walk(qt_ref[0], k_ref, vt_ref, kv_padded, chunk_kv)
    d = o_ref.shape[1]
    o_ref[0] = (acc[:d, :] / acc[d:d + 1, :]).astype(o_ref.dtype)


def _chunk_walk(qt, k_ref, vt_ref, kv_padded: int, chunk_kv: int):
    """Shared online-softmax walk over resident kv chunks (transposed).

    Returns (acc (dv, n_block) fp32, m (1, n_block) fp32) where row d of
    acc is the softmax denominator l = sum exp2(s - m) (exp2 domain, q
    pre-scaled by log2(e)/sqrt(d))."""
    m = None
    acc = None
    for start in range(0, kv_padded, chunk_kv):
        k = k_ref[0, start:start + chunk_kv, :]       # (chunk, d)
        vt = vt_ref[0, :, start:start + chunk_kv]     # (dv, chunk)
        s = jax.lax.dot_general(
            k, qt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (chunk, n_block)
        if m is None:
            m = jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp2(s - m)
            acc = jax.lax.dot_general(
                vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (dv, n_block)
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            acc = acc * alpha + jax.lax.dot_general(
                vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
    return acc, m


def _flash_kernel_stats(
    qt_ref, k_ref, vt_ref, o_ref, m_ref, l_ref, *, kv_padded: int, chunk_kv: int
):
    """_flash_kernel + per-query softmax statistics (m, l) as outputs, for
    cross-shard merging in ring/sequence-parallel attention. Stats are in
    the exp2 domain of the PRE-SCALED scores (s2 = s_nat * log2(e))."""
    acc, m = _chunk_walk(qt_ref[0], k_ref, vt_ref, kv_padded, chunk_kv)
    d = o_ref.shape[1]
    l = acc[d:d + 1, :]
    o_ref[0] = (acc[:d, :] / l).astype(o_ref.dtype)
    m_ref[0] = m
    l_ref[0] = l


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _prep_transposed(q, k, v, kv_len: int, chunk_align: int,
                     n_q_pad: Optional[int] = None):
    """Shared operand prep for the transposed kernels: prescale q by
    log2(e)/sqrt(d), pad, mask kv, and lay out qt (bh, d[+1], n_q_pad),
    k3 (bh, n_kv_pad, d[+1]), vt_ext (bh, dv, n_kv_pad) with the ones
    denominator row at index d.

    Masking uses an AUGMENTED contraction dimension instead of an
    in-kernel iota: Q^T gains a ones row and K a bias column that is 0 on
    valid rows and -1e9 on masked/padded ones, so masked scores come out
    ~-1e9 — true -inf semantics. (Merely ZEROING masked K rows is wrong:
    their score 0 would pull the running max up to 0, and when every real
    score is strongly negative exp2(s - 0) underflows to 0 for all valid
    columns, giving 0/0 = NaN.) The extra row costs nothing: the MXU
    contraction is lane-padded past d anyway, and the hot path
    (kv_len == n_kv_pad, the pad-free SD3 shape) skips augmentation
    entirely."""
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    q = (q.astype(jnp.float32) * (_LOG2E / d**0.5)).astype(q.dtype)
    if n_q_pad is None:
        n_q_pad = _round_up(n_q, 128)
    n_kv_pad = _round_up(n_kv, chunk_align)
    if n_q_pad != n_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, n_q_pad - n_q), (0, 0)))
    if n_kv_pad != n_kv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, n_kv_pad - n_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_kv_pad - n_kv), (0, 0)))
    ones = jnp.ones((b, h, 1, n_kv_pad), v.dtype)
    if kv_len < n_kv_pad:
        valid = (jnp.arange(n_kv_pad) < kv_len).astype(jnp.float32)
        bias_col = ((valid - 1.0) * 1e9).astype(k.dtype)  # 0 valid, -1e9 masked
        k = jnp.concatenate(
            [k, jnp.broadcast_to(bias_col[None, None, :, None], (b, h, n_kv_pad, 1))],
            axis=-1,
        )
        q = jnp.concatenate([q, jnp.ones((b, h, n_q_pad, 1), q.dtype)], axis=-1)
        # belt-and-suspenders: masked V^T/ones columns contribute nothing
        # even before the exp2 underflows their p to exact zero
        vmask = valid.astype(v.dtype)
        v = v * vmask[None, None, :, None]
        ones = ones * vmask[None, None, None, :]
    bh = b * h
    d_aug = q.shape[-1]
    dv = _round_up(d + 1, 16)  # bf16 sublane tile
    qt = jnp.swapaxes(q, -1, -2).reshape(bh, d_aug, n_q_pad)
    vt = jnp.swapaxes(v, -1, -2)
    pad_rows = jnp.zeros((b, h, dv - d - 1, n_kv_pad), v.dtype)
    vt_ext = jnp.concatenate([vt, ones, pad_rows], axis=2).reshape(bh, dv, n_kv_pad)
    return qt, k.reshape(bh, n_kv_pad, d_aug), vt_ext, n_q_pad, n_kv_pad, dv, bh


def _flash_kernel_streaming(qt_ref, k_ref, vt_ref, o_ref, acc_ref, m_ref):
    """Online-softmax flash attention, kv streaming in blocks via the grid.

    For sequences too long for resident K/V (2048px generation at ~16.7k
    joint tokens). Same TRANSPOSED layout as the resident kernel (query
    axis = lanes, see _flash_kernel) with the running (m, acc) state in
    fp32 scratch across the innermost kv grid dimension; the softmax
    denominator rides row d of the accumulator (ones row of V^T), and
    masking happens by operand zeroing outside (exactness argued at
    _flash_kernel). Grid: (bh, q_blocks, kv_blocks), kv innermost.
    """
    t = pl.program_id(2)
    n_kv_blocks = pl.num_programs(2)

    @pl.when(t == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)

    qt = qt_ref[0]   # (d, block_q)
    k = k_ref[0]     # (block_kv, d)
    vt = vt_ref[0]   # (dv, block_kv)

    s = jax.lax.dot_general(
        k, qt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_kv, block_q)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(t == n_kv_blocks - 1)
    def _finalize():
        d = o_ref.shape[1]
        o_ref[0] = (acc_ref[:d, :] / acc_ref[d:d + 1, :]).astype(o_ref.dtype)


def _flash_attention_streaming_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int],
    block_q: int,
    block_kv: int,
    interpret: bool,
) -> jax.Array:
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    if kv_len is None:
        kv_len = n_kv
    block_q, n_q_target = _pick_n_block(_round_up(n_q, 128), block_q)
    qt, k3, vt_ext, n_q_pad, n_kv_pad, dv, bh = _prep_transposed(
        q, k, v, kv_len, block_kv, n_q_pad=n_q_target
    )
    d_aug = qt.shape[1]

    out = pl.pallas_call(
        _flash_kernel_streaming,
        grid=(bh, n_q_pad // block_q, n_kv_pad // block_kv),
        in_specs=[
            pl.BlockSpec(
                (1, d_aug, block_q), lambda i, j, t: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_kv, d_aug), lambda i, j, t: (i, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, dv, block_kv), lambda i, j, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, d, block_q), lambda i, j, t: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, d, n_q_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((dv, block_q), jnp.float32),
            pltpu.VMEM((1, block_q), jnp.float32),
        ],
        interpret=interpret,
    )(qt, k3, vt_ext)
    out = jnp.swapaxes(out.reshape(b, h, d, n_q_pad), -1, -2)
    return out[:, :, :n_q, :]


# Above this kv length, the resident-KV kernel's fp32 score row would blow
# the ~16MB VMEM budget; switch to the streaming online-softmax kernel.
_STREAMING_KV_THRESHOLD = 8192

# VMEM the resident kernel may budget for (of ~16MB/core, leaving room for
# Mosaic's pipeline buffers). 8MB also biases d=128 shapes toward
# mid-size query blocks, which measured ~8% faster than max-size there
# (experiments/attn_d128_tune.py: nb2304 3.26 ms vs nb4608 3.53 ms).
_RESIDENT_VMEM_BUDGET = 8 * 1024 * 1024


def _streaming_blocks(d: int, itemsize: int):
    """(block_q, block_kv) for the streaming kernel, sized by the same
    VMEM model as the resident path: fp32 score/acc blocks plus
    double-buffered operand blocks must fit the budget. (1536, 512) is
    the swept optimum for bf16 d<=128 (experiments/attn_d128_tune.py);
    wide/fp32 shapes shrink automatically."""
    dv = _round_up(d + 1, 16)
    for bq in (1536, 1024, 512, 256, 128):
        for bkv in (512, 256, 128):
            use = (
                4 * bkv * bq                      # fp32 score block
                + 4 * dv * bq                     # fp32 accumulator
                + 2 * itemsize * (
                    (d + 1) * bq + bkv * (d + 1) + dv * bkv
                )                                  # double-buffered operands
            )
            if use <= _RESIDENT_VMEM_BUDGET:
                return bq, bkv
    return 128, 128


def _resident_lane_cap(n_kv_pad: int, d: int, itemsize: int,
                       chunk_kv: int = 128) -> int:
    """How many query LANES the resident kernel can afford in one block.

    Resident cost: K (+ possible bias column) and V^T_ext stay whole in
    VMEM; per query lane we hold a score-chunk column (fp32), an fp32
    accumulator column, and qt/out columns at the input itemsize. The
    dispatcher caps n_block to this (wide single-head shapes like the
    VAE's d=512 get small blocks) and falls back to the streaming kernel
    when fewer than 128 lanes fit.
    """
    dv = _round_up(d + 1, 16)
    resident = n_kv_pad * itemsize * (d + 1 + dv)
    per_lane = 4 * chunk_kv + 4 * dv + 2 * itemsize * d
    return (_RESIDENT_VMEM_BUDGET - resident) // per_lane


def _pick_n_block(n_q_pad: int, block_q: Optional[int]) -> tuple:
    """Pick (n_block, padded_n_q): the largest 128-multiple block under the
    caller's cap whose grid wastes <= ~4% of the query axis in padding.

    Big blocks measured fastest (resident K/V amortize over the full chunk
    walk, Mosaic pipelines the 128-row kv chunks), but requiring EXACT
    divisibility strands awkward lengths — 2048px generation has
    n_q_pad = 128*131 (131 prime), which would force 128-lane blocks
    (~45 TF/s) when a 1536-lane block with 0.8% extra padding runs far
    faster. Extra padded query lanes cost only their share of FLOPs and
    are sliced off the output."""
    cap = n_q_pad if block_q is None else max(128, block_q // 128 * 128)
    cap = min(cap, n_q_pad)
    for nb in range(cap, 127, -128):
        padded = _round_up(n_q_pad, nb)
        if (padded - n_q_pad) * 25 <= n_q_pad:  # <= 4% waste
            return nb, padded
    # unreachable: nb=128 always has zero waste (n_q_pad is a 128-multiple)
    raise AssertionError(n_q_pad)


def _flash_attention_fwd_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int],
    block_q: Optional[int],
    interpret: bool,
    chunk_kv: int = 128,
    with_stats: bool = False,
):
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    if kv_len is None:
        kv_len = n_kv

    # _prep_transposed folds scale + the exp->exp2 base change into q (one
    # tiny elementwise op instead of a per-score multiply), transposes the
    # operands (query axis = lanes), and masks kv via an augmented
    # contraction row/column (masked scores -> -1e9), so the kernel needs
    # no iota mask.
    n_block, n_q_target = _pick_n_block(_round_up(n_q, 128), block_q)
    qt, k3, vt_ext, n_q_pad, n_kv_pad, dv, bh = _prep_transposed(
        q, k, v, kv_len, chunk_kv, n_q_pad=n_q_target
    )
    d_aug = qt.shape[1]

    grid = (bh, n_q_pad // n_block)
    in_specs = [
        pl.BlockSpec(
            (1, d_aug, n_block), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, n_kv_pad, d_aug), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, dv, n_kv_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    o_spec = pl.BlockSpec(
        (1, d, n_block), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=4 * bh * n_q_pad * n_kv_pad * d,
        bytes_accessed=(2 * bh * n_q_pad * d + 2 * bh * n_kv_pad * d)
        * q.dtype.itemsize,
        transcendentals=bh * n_q_pad * n_kv_pad,
    )
    if with_stats:
        stat_spec = pl.BlockSpec(
            (1, 1, n_block), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        out, m, l = pl.pallas_call(
            functools.partial(
                _flash_kernel_stats, kv_padded=n_kv_pad, chunk_kv=chunk_kv
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=(o_spec, stat_spec, stat_spec),
            out_shape=(
                jax.ShapeDtypeStruct((bh, d, n_q_pad), q.dtype),
                jax.ShapeDtypeStruct((bh, 1, n_q_pad), jnp.float32),
                jax.ShapeDtypeStruct((bh, 1, n_q_pad), jnp.float32),
            ),
            interpret=interpret,
            cost_estimate=cost,
        )(qt, k3, vt_ext)
        out = jnp.swapaxes(out.reshape(b, h, d, n_q_pad), -1, -2)[:, :, :n_q, :]
        m = m.reshape(b, h, n_q_pad)[:, :, :n_q]
        l = l.reshape(b, h, n_q_pad)[:, :, :n_q]
        return out, m, l

    out = pl.pallas_call(
        functools.partial(_flash_kernel, kv_padded=n_kv_pad, chunk_kv=chunk_kv),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((bh, d, n_q_pad), q.dtype),
        interpret=interpret,
        cost_estimate=cost,
    )(qt, k3, vt_ext)

    out = jnp.swapaxes(out.reshape(b, h, d, n_q_pad), -1, -2)
    return out[:, :, :n_q, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _resident_flash_attention(q, k, v, kv_len, block_q, interpret):
    return _flash_attention_fwd_impl(q, k, v, kv_len, block_q, interpret)


def _fwd(q, k, v, kv_len, block_q, interpret):
    return _flash_attention_fwd_impl(q, k, v, kv_len, block_q, interpret), (q, k, v)


def _bwd(kv_len, block_q, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v, kv_len), q, k, v)
    return vjp(g)


_resident_flash_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _streaming_flash_attention(q, k, v, kv_len, block_q, block_kv, interpret):
    return _flash_attention_streaming_impl(
        q, k, v, kv_len, block_q, block_kv, interpret
    )


def _sfwd(q, k, v, kv_len, block_q, block_kv, interpret):
    out = _flash_attention_streaming_impl(
        q, k, v, kv_len, block_q, block_kv, interpret
    )
    return out, (q, k, v, out)


def attention_backward_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    do: jax.Array,
    kv_len: Optional[int] = None,
    chunk: int = 1024,
):
    """Flash-attention backward that never materializes the (n, n) scores.

    Standard two-pass chunked recomputation (the structure torch SDPA's
    flash backward uses internally — the capability the reference gets for
    free from torch, transformer_sd3.py:28,279): pass 1 rebuilds the
    per-row softmax statistics (m, l) online over kv chunks; pass 2 walks
    the chunks again computing dv_c = p_cᵀ·do, ds_c = p_c∘(do·v_cᵀ − D),
    dq += ds_c·k_c, dk_c = ds_cᵀ·q, with D = rowsum(do∘o). Peak memory is
    O(n_q·chunk) per (batch, head) — safe at 16k+ tokens where the dense
    VJP would need n² fp32. Pure XLA (lax.scan), so it runs on any backend
    and stays off the Pallas hot path (TPDM freezes the backbone; this
    exists for long-sequence fine-tuning).
    """
    n_kv = k.shape[2]
    if kv_len is None:
        kv_len = n_kv
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    n_pad = _round_up(n_kv, chunk)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, n_pad - n_kv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, n_pad - n_kv), (0, 0)))
    n_chunks = n_pad // chunk
    # (c, b, h, chunk, d) chunk-major for scan
    kc = jnp.moveaxis(kp.reshape(*k.shape[:2], n_chunks, chunk, d), 2, 0)
    vc = jnp.moveaxis(vp.reshape(*v.shape[:2], n_chunks, chunk, d), 2, 0)
    qf = q.astype(jnp.float32)

    def scores(k_chunk, c):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_chunk.astype(jnp.float32)
        ) * scale
        col = c * chunk + jnp.arange(chunk)
        return jnp.where(col[None, None, None, :] < kv_len, s, _NEG_INF)

    # pass 1: online softmax statistics (m, l) per query row
    def stats_step(carry, xs):
        m_run, l_run = carry
        k_chunk, c = xs
        s = scores(k_chunk, c)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
        l_new = l_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(s - m_new[..., None]), axis=-1
        )
        return (m_new, l_new), None

    bq_shape = q.shape[:3]
    (m, l), _ = jax.lax.scan(
        stats_step,
        (jnp.full(bq_shape, _NEG_INF, jnp.float32), jnp.zeros(bq_shape, jnp.float32)),
        (kc, jnp.arange(n_chunks)),
    )

    dof = do.astype(jnp.float32)
    D = jnp.sum(dof * o.astype(jnp.float32), axis=-1)  # (b, h, nq)

    # pass 2: chunked gradients
    def grad_step(dq_acc, xs):
        k_chunk, v_chunk, c = xs
        s = scores(k_chunk, c)
        p = jnp.exp(s - m[..., None]) / l[..., None]
        dv_c = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
        dp = jnp.einsum("bhqd,bhkd->bhqk", dof, v_chunk.astype(jnp.float32))
        ds = p * (dp - D[..., None]) * scale
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds, k_chunk.astype(jnp.float32))
        dk_c = jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
        return dq_acc, (dk_c, dv_c)

    dq, (dk_c, dv_c) = jax.lax.scan(
        grad_step,
        jnp.zeros(q.shape, jnp.float32),
        (kc, vc, jnp.arange(n_chunks)),
    )
    dk = jnp.moveaxis(dk_c, 0, 2).reshape(*k.shape[:2], n_pad, d)[:, :, :n_kv]
    dv = jnp.moveaxis(dv_c, 0, 2).reshape(*v.shape[:2], n_pad, d)[:, :, :n_kv]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _sbwd(kv_len, block_q, block_kv, interpret, res, g):
    q, k, v, out = res
    return attention_backward_chunked(q, k, v, out, g, kv_len, chunk=block_kv)


_streaming_flash_attention.defvjp(_sfwd, _sbwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention. q,k,v: (b, h, n, d); returns (b, h, n_q, d).

    Args:
        kv_len: number of valid kv positions (static); positions >= kv_len
            are masked. None = all valid.
        block_q: optional cap on query columns per program (128 multiple).
            None (default) = auto: the largest block the VMEM model
            affords (the whole padded query axis at the SD3 d=64 shape,
            77 TF/s; mid-size blocks at d=128, which measured ~8% faster
            there — experiments/attn_round3b.py, attn_d128_tune.py). The
            query axis may be padded a few % so the block tiles it.
        interpret: run the kernel in the Pallas interpreter (CPU testing).

    Long sequences (> _STREAMING_KV_THRESHOLD kv tokens, e.g. 2048px
    generation at ~16.7k) dispatch to a kv-streaming online-softmax kernel
    (differentiable via the chunked two-pass backward); shorter sequences
    use the faster transposed-layout resident-KV kernel (dense-recompute
    VJP).
    """
    lane_cap = _resident_lane_cap(
        _round_up(k.shape[2], 128), q.shape[-1], q.dtype.itemsize
    )
    if k.shape[2] > _STREAMING_KV_THRESHOLD or lane_cap < 128:
        bq, bkv = _streaming_blocks(q.shape[-1], q.dtype.itemsize)
        return _streaming_flash_attention(
            q, k, v, kv_len, bq if block_q is None else min(block_q, bq),
            bkv, interpret,
        )
    block_q = lane_cap if block_q is None else min(block_q, lane_cap)
    return _resident_flash_attention(q, k, v, kv_len, block_q, interpret)


def flash_attention_with_stats(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int] = None,
    interpret: bool = False,
):
    """Like flash_attention, additionally returning per-query softmax
    statistics (m, l) for cross-shard merging (ring attention):

        o = sum_j exp2(s2_j - m) v_j / l,  l = sum_j exp2(s2_j - m)

    with s2 = (q·k/sqrt(d)) * log2(e) — the exp2 domain the kernel works
    in. Shapes: o (b,h,n_q,d); m, l (b,h,n_q) fp32. Forward-only (no VJP):
    the TPDM backbone is frozen, and sequence-parallel backward would need
    its own ring (tracked in docs/ROADMAP.md).
    """
    lane_cap = _resident_lane_cap(
        _round_up(k.shape[2], 128), q.shape[-1], q.dtype.itemsize
    )
    if k.shape[2] > _STREAMING_KV_THRESHOLD or lane_cap < 128:
        raise ValueError(
            "stats variant is resident-KV only; shard kv below "
            f"{_STREAMING_KV_THRESHOLD} per device and/or reduce head_dim "
            "(ring attention shards the kv axis for exactly this)"
        )
    return _flash_attention_fwd_impl(
        q, k, v, kv_len, lane_cap, interpret, with_stats=True
    )


def attention_reference_stats(q, k, v, kv_len: Optional[int] = None):
    """jnp reference with the same (o, m, l) contract / exp2 domain."""
    d = q.shape[-1]
    s2 = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (_LOG2E / d**0.5)
    if kv_len is not None and kv_len < k.shape[2]:
        mask = jnp.arange(k.shape[2]) < kv_len
        s2 = jnp.where(mask[None, None, None, :], s2, _NEG_INF)
    m = jnp.max(s2, axis=-1)
    p = jnp.exp2(s2 - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ) / l[..., None]
    return o.astype(q.dtype), m, l


def merge_attention_shards(o_parts, m_parts, l_parts):
    """Combine per-shard partial attentions into the global softmax result.

    Standard distributed-softmax merge: with per-shard (o_i, m_i, l_i),
    the exact global output is sum_i w_i o_i / sum_i w_i where
    w_i = exp2(m_i - m*) l_i and m* = max_i m_i. Stacked inputs:
    o (p, b, h, n, d); m, l (p, b, h, n).
    """
    m_star = jnp.max(m_parts, axis=0)
    w = jnp.exp2(m_parts - m_star[None]) * l_parts  # (p, b, h, n)
    denom = jnp.sum(w, axis=0)
    num = jnp.sum(w[..., None] * o_parts.astype(jnp.float32), axis=0)
    return (num / denom[..., None]).astype(o_parts.dtype)


def joint_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatch to the Pallas kernel on TPU, jnp reference elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if use_pallas:
        return flash_attention(q, k, v, kv_len)
    return attention_reference(q, k, v, kv_len)
