"""Continuous batching for adaptive-NFE serving: step-level slot recycling.

Why this exists: TPDM's whole point is that each prompt gets its OWN number
of denoise steps (the adaptive schedule self-terminates, reference:
src/models/stable_diffusion_3/modeling_sd3_pnt.py:582-609). Under the
fixed-batch engine (`tpdm_tpu.serving.BatchingEngine`) a batch runs until
its SLOWEST sample finishes — with a trained policy whose NFE varies
per prompt, every other slot idles for (max − own) steps. This engine
instead treats the batch as S persistent *slots* and the denoise loop as a
sequence of fixed-length jitted *segments*:

    ┌─ refill free slots from the request queue (encode prompt, init latent)
    │  run ONE jitted segment: `seg_steps` adaptive steps over all S slots
    │  (finished/empty slots freeze in-graph: sigma & latents held by mask)
    │  host sync: read (sigma, steps) — slots that crossed min_sigma or the
    │  step cap capture their latent row and free the slot; a decode worker
    │  thread runs the batch-1 decode + readback OFF the segment loop (the
    │  decode host sync would otherwise stall the next segment dispatch)
    └─ repeat

so a finished slot is re-used after at most `seg_steps` more forwards
instead of waiting for the batch max. Everything stays ONE compiled shape:
one segment jit (S slots × seg_steps), one batch-1 prompt encode, one
batch-1 decode — no recompiles at any traffic level or NFE mix.

TPU-native reasoning: SPMD batches are fixed-shape, so LLM-style
token-level continuous batching maps to *segment-level* recycling here;
`seg_steps` trades host-sync frequency (one ~ms readback per segment; ~190
ms over a tunnel) against recycling latency (a finished slot idles at most
seg_steps − 1 forwards). The per-request step waste drops from
E[max NFE in batch] − E[NFE] (static) to at most seg_steps/2 on average.

Determinism: with predict=True (the serving default, reference
gradio_sd3_inference.py:45) a request's image depends only on its
(prompt, seed) — bit-identical to `pipe.generate` / `BatchingEngine` for
the same inputs, whatever the slot mix (convs/attention never cross the
batch axis). With predict=False, draws come from one carried key, so
per-request reproducibility is not guaranteed (same as any shared-stream
sampler).

The negative-prompt embedding (CFG uncond branch, always the empty prompt
in serving) is encoded ONCE at startup and broadcast — the fixed-batch
engine re-encodes it every batch through pipe.generate.
"""

from __future__ import annotations

import collections
import logging
import queue
import threading
import time
from typing import Callable, NamedTuple, Optional

import numpy as np

from tpdm_tpu.serving import EngineOverloaded, ServeRequest

logger = logging.getLogger(__name__)


def _jit_segment(engine, segment, donate, shardings=None):
    """jit the segment body with a trace counter on the engine.

    `engine.segment_traces` counts how many distinct argument signatures
    have been TRACED. Tracing runs exactly once per compiled shape even
    when the executable itself deserializes from the persistent compile
    cache (the cache skips XLA compilation, never tracing), so — unlike
    jax's private `PjitFunction._cache_size()`, which reads 0 on a
    persistent-cache hit — the counter is hermetic to on-disk cache
    state. Tests assert `segment_traces == 1` to pin the
    one-compiled-shape invariant of continuous batching.
    """
    import jax

    def counted(*args):
        engine.segment_traces += 1
        return segment(*args)

    kw = dict(donate_argnums=donate)
    if shardings is not None:
        kw["out_shardings"] = shardings
    return jax.jit(counted, **kw)


class PromptEmbedCache:
    """Thread-safe LRU of prompt -> encoded embeds.

    Shareable across engines: embeds depend only on the prompt, never on
    the latent resolution — MultiResContinuousRouter hands ONE instance to
    every per-resolution engine so a repeated prompt pays one cold
    text-encode total (T5-XXL streaming is the dominant cold-prompt cost)
    instead of one per served resolution. The lock matters because each
    engine reads/writes from its own worker thread.
    """

    def __init__(self, size: int = 256):
        self.size = size
        self._d: "collections.OrderedDict" = collections.OrderedDict()
        self._lock = threading.Lock()

    def get(self, key):
        with self._lock:
            hit = self._d.get(key)
            if hit is not None:
                self._d.move_to_end(key)
            return hit

    def put(self, key, val):
        with self._lock:
            self._d[key] = val
            while len(self._d) > self.size:
                self._d.popitem(last=False)
        return val

    def __len__(self) -> int:
        return len(self._d)


class _SlotState(NamedTuple):
    """Device-resident per-slot state carried across segments."""

    latents: object  # (S, c, h, w) model dtype
    sigma: object  # (S,) f32; 0.0 == finished/empty (< min_sigma)
    steps: object  # (S,) i32 — executed denoise steps (NFE so far)
    caps: object  # (S,) i32 per-request step cap (ServeRequest.steps)
    pe: object  # (S, L, D) positive prompt embeds
    pp: object  # (S, P) positive pooled embeds
    key: object  # PRNG key (predict=False draws)
    # per-request CFG state (SD3 engine, CFG on; None otherwise):
    gs: object = None  # (S,) f32 per-slot guidance strength
    neg_pe: object = None  # (S, L, D) per-slot negative prompt embeds
    neg_pp: object = None  # (S, P) per-slot negative pooled embeds


class ContinuousBatchingEngine:
    """Slot-recycling serving engine for adaptive-NFE pipelines.

    Args:
        pipe: a TPDMPipeline with text_encoders (prompt -> embeds on refill).
        tokenize: prompt -> (clip_ids (1, 77), t5_ids (1, L)) numpy arrays.
        slots: compiled slot count S (the persistent batch width).
        seg_steps: denoise steps per jitted segment between host syncs.
        max_steps: per-request adaptive step cap (gradio demo default 35).
        predict: deterministic Beta-mode schedules (serving default).
        queue_limit: submit() backpressure bound (default 8 * slots).
        embed_cache_size: LRU entries of prompt -> embeds (repeat prompts
            skip the text towers entirely).
        async_decode: complete finished slots on a decode worker thread
            instead of inline between segments. A finished slot only needs
            its latent row (an on-device slice) captured before the state
            is recycled; the batch-1 VAE decode + host readback — a full
            host sync, ~190 ms over a tunneled chip — then overlaps the
            next segments instead of stalling them. Default on; off gives
            the old strictly-sequential loop (measurement/debug).
        resolution: output resolution in image px served by THIS engine
            (None = the model default, sample_size * vae_scale_factor).
            One engine serves ONE compiled latent shape; use
            MultiResContinuousRouter for a multi-resolution service.
        vae_scale_factor: px-per-latent upscale of the VAE (8 for SD VAEs;
            the toy test VAE is 2). Maps resolution -> latent grid.
        dp: shard the SLOT axis over a ("data",)-axis mesh of the first
            `dp` devices (weights replicated once; slots must divide by
            dp). Segments stay ONE jitted program — GSPMD data
            parallelism, same placement as BatchingEngine(dp=...).
        mesh_shape: full (data, fsdp, tensor) serving mesh — backbone/VAE
            weights sharded by the training specs, slots over
            (data, fsdp). Mutually exclusive with dp.
    """

    def __init__(
        self,
        pipe,
        tokenize: Callable[[str], tuple],
        slots: int = 4,
        seg_steps: int = 4,
        max_steps: int = 35,
        guidance_scale: Optional[float] = 7.0,
        predict: bool = True,
        queue_limit: Optional[int] = None,
        embed_cache_size: int = 256,
        embed_cache: Optional[PromptEmbedCache] = None,
        dp: Optional[int] = None,
        mesh_shape: Optional[tuple] = None,
        async_decode: bool = True,
        resolution: Optional[int] = None,
        vae_scale_factor: int = 8,
        fused_lora: bool = False,
        pipeline_depth: int = 1,
        decode_batch: int = 1,
        cache_interval: int = 0,
        solver: str = "euler",
    ):
        if slots < 1 or seg_steps < 1:
            raise ValueError("slots and seg_steps must be >= 1")
        if cache_interval == 1 or cache_interval < 0:
            raise ValueError("cache_interval must be 0 (off) or >= 2")
        if cache_interval and pipe is None:
            # family engines' segment loops do not carry the cache pair yet
            raise ValueError(
                "cache_interval on the continuous engine is the SD3 "
                "pipeline path"
            )
        if solver not in ("euler", "ab2"):
            raise ValueError(
                f"continuous engine solver must be 'euler' or 'ab2', got "
                f"{solver!r}"
            )
        if solver != "euler" and pipe is None:
            raise ValueError(
                "solver on the continuous engine is the SD3 pipeline path"
            )
        if solver != "euler" and cache_interval:
            raise ValueError(
                "solver='ab2' and cache_interval are mutually exclusive on "
                "the continuous engine (both extend the segment carry)"
            )
        if pipeline_depth < 1:
            raise ValueError("pipeline_depth must be >= 1")
        if decode_batch < 1:
            raise ValueError("decode_batch must be >= 1")
        if fused_lora and pipe is None and not hasattr(self, "agent"):
            # agent-backed family engines (which set self.agent before
            # delegating here) opt in via their own register_adapter
            raise ValueError("fused_lora needs the SD3 pipeline engine")
        if resolution is not None and resolution % vae_scale_factor != 0:
            raise ValueError(
                f"resolution {resolution} not a multiple of vae_scale_factor "
                f"{vae_scale_factor}"
            )
        if resolution is not None and pipe is not None:
            # the latent grid must also patchify: catch it here, not as a
            # shape error inside the worker thread's first segment trace
            patch = getattr(pipe.mmdit.config, "patch_size", 1)
            if (resolution // vae_scale_factor) % patch:
                raise ValueError(
                    f"resolution {resolution} needs a latent grid divisible "
                    f"by patch_size {patch}: use a multiple of "
                    f"{vae_scale_factor * patch}"
                )
        self.resolution = resolution
        self.vae_scale_factor = vae_scale_factor
        if dp is not None and mesh_shape is not None:
            raise ValueError("pass dp OR mesh_shape, not both")
        bshards = dp if dp is not None else (
            mesh_shape[0] * mesh_shape[1] if mesh_shape is not None else 1
        )
        if slots % bshards != 0:
            raise ValueError(
                f"slots {slots} not divisible by batch shards {bshards}"
            )
        self.pipe = pipe
        self.tokenize = tokenize
        self.slots = slots
        self.seg_steps = seg_steps
        self.cache_interval = cache_interval
        self.solver = solver
        self.max_steps = max_steps
        self.guidance_scale = guidance_scale
        self.predict = predict
        self._queue: "queue.Queue[Optional[ServeRequest]]" = queue.Queue(
            maxsize=queue_limit if queue_limit is not None else 8 * slots
        )
        # requests drained from _queue awaiting a slot (adapter-affinity
        # refill may serve them out of FIFO order, bounded by aging)
        self._pending: "collections.deque" = collections.deque()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        # -- multi-tenant LoRA adapters (register_adapter) --
        # Slots may carry different adapters; each SEGMENT runs under ONE
        # adapter's merged backbone (time-multiplexed — switching the param
        # operand of the compiled segment costs no recompile), with the
        # other adapters' slots frozen by the live-mask. name -> (factors,
        # scale); merged trees materialize lazily into an LRU.
        self._adapters: dict = {}
        self._merged: "collections.OrderedDict" = collections.OrderedDict()
        self._merged_cache_size = 1
        self._merge_jit = None
        self._slot_adapter: list = [None] * slots
        # fused mode (fused_lora=True): per-slot rank-r deltas from a
        # stacked factor bank applied INSIDE the backbone — every segment
        # advances ALL adapters at once (full slot utilization for any
        # tenant mix, no merged weight copies; numerics differ from the
        # merged path by the base matmul's rounding of W vs W+Δ)
        self.fused_lora = bool(fused_lora)
        # pipeline_depth > 1: keep that many dispatched segments in flight
        # and read trailing results back while the device runs ahead —
        # hides the per-segment host sync (the dominant scheduler overhead
        # when the device is remote). Numerically free: a slot that
        # finishes during segment k is frozen in-graph by the done-mask,
        # so the speculatively dispatched segment k+1 no-ops on it; the
        # cost is recycling latency (a freed slot seats new work up to
        # depth-1 segments later).
        self.pipeline_depth = int(pipeline_depth)
        self._bank = None
        self._adapter_ids: dict = {}
        self._fused_active = False
        self.adapter_merges = 0  # merged-tree LRU misses (full merges paid)
        self.adapter_segments: dict = {}  # adapter name -> segments run
        # fairness: an adapter with busy slots runs at least every
        # `adapter_fair_every` segments, whatever the greedy count says
        self.adapter_fair_every = 4
        self._adapter_skipped: dict = {}  # name -> consecutive skips
        # aging bound on affinity refill: a pending request older than
        # this is seated FIFO even if its adapter has no slots in flight
        self.adapter_starvation_s = 5.0
        self.async_decode = async_decode
        # decode_batch > 1 (async decode only): the decode worker drains
        # up to this many finished slots per pass and decodes them as ONE
        # padded pow-2 batch — the VAE amortizes markedly batched
        # (docs/PERF.md: 102 -> 79 ms/img at batch 8 for SD3 1024px) at
        # the cost of log2(decode_batch) extra compiled decode shapes
        self.decode_batch = int(decode_batch)
        self.decode_rows_coalesced = 0  # rows decoded in batches > 1
        # finished slots' (req, latent_row, nfe, sigmas) awaiting decode
        self._decode_queue: "queue.Queue" = queue.Queue()
        self._decode_thread: Optional[threading.Thread] = None
        # host-side slot table: index -> in-flight ServeRequest (or None)
        self._slot_req: list = [None] * slots
        self._slot_sigmas: list = [[] for _ in range(slots)]
        # host mirror of the device step counters (avoids a pre-segment
        # device readback just to compute per-segment executed-step deltas)
        self._steps_host = np.zeros((slots,), np.int64)
        self._caps_host = np.full((slots,), max_steps, np.int64)
        # observability
        self.segments_run = 0
        self.requests_done = 0
        self.requests_expired = 0  # deadline load-shedding counter
        self.slot_steps_total = 0  # S * seg_steps * segments
        self.slot_steps_active = 0  # steps that advanced a real request
        self._nfe_done: "collections.deque" = collections.deque(maxlen=512)
        self._latency_done: "collections.deque" = collections.deque(maxlen=512)
        self._embed_cache = (
            embed_cache if embed_cache is not None
            else PromptEmbedCache(embed_cache_size)
        )
        self._lock = threading.Lock()  # guards counters read by stats()

        self._mesh = None
        if dp is not None or mesh_shape is not None:
            self._mesh = self._setup_placement(dp, mesh_shape)

        self._build_device_functions()

    def _setup_placement(self, dp, mesh_shape):
        """Place model weights for multi-device serving; returns the mesh.
        dp: replicate weights over a data mesh. mesh_shape: shard ONE model
        instance over (data, fsdp, tensor). Family engines override to
        place their agent's params instead of the pipeline's."""
        if dp is not None:
            from tpdm_tpu.serving import setup_dp_placement

            mesh, _ = setup_dp_placement(self.pipe, dp)
        else:
            from tpdm_tpu.serving import setup_mesh_placement

            mesh, _ = setup_mesh_placement(self.pipe, mesh_shape)
        return mesh

    # -- multi-tenant LoRA adapters ----------------------------------------
    def register_adapter(
        self, name: str, lora: dict, scale: float = 1.0,
        merged_cache: int = 1,
    ):
        """Serve a named LoRA adapter next to the base model under
        CONTINUOUS batching: requests carrying ``lora=name`` run on
        ``apply_lora(base, lora, scale)``.

        Slots holding different adapters coexist in the pool; each
        segment is TIME-MULTIPLEXED to one adapter — the scheduler picks
        the adapter with the most runnable slots (round-robin fairness
        floor: every adapter with busy slots runs at least every
        ``adapter_fair_every`` segments) and the live-mask freezes the
        rest, so a request's trajectory equals a solo run under its
        merged weights regardless of slot peers. Switching the segment's
        param operand is recompile-free (same shapes/dtypes); the cost of
        a mixed-adapter pool is utilization (frozen slots idle), reported
        by ``stats()["slot_utilization"]`` — the fixed-batch engine's
        per-adapter sub-batches (tpdm_tpu/serving.py register_adapter)
        pay the same price as padding instead.

        SD3 pipeline engines only (family engines override: FLUX serves
        adapters fused-only).
        """
        if self.pipe is None:
            raise ValueError(
                "adapters need the SD3 pipeline engine; family engines "
                "own their backbone params"
            )
        if not self.fused_lora:
            import jax
            import jax.numpy as jnp

            # multiplex mode materializes apply_lora(base, factors) —
            # impossible on stored-int kernels (the delta has no float
            # weight to merge into). Fused mode never merges: the
            # interceptor adds x@A@B next to the quantized matmul, so a
            # QLoRA-style int8/int4 backbone serves adapters fine there.
            if any(
                getattr(leaf, "dtype", None) in (jnp.int8, jnp.int4)
                for leaf in jax.tree.leaves(self.pipe.mmdit_params)
            ):
                raise ValueError(
                    "quantized (--int8/--int4) backbones serve adapters "
                    "fused-only: build the engine with fused_lora=True"
                )
        self._store_adapter(name, lora, scale)
        self._merged_cache_size = max(self._merged_cache_size, merged_cache)

    def _store_adapter(self, name: str, lora: dict, scale: float):
        """Shared validation + mesh placement + registration."""
        if not name:
            raise ValueError("adapter name must be non-empty")
        if not lora:
            raise ValueError("empty LoRA tree")
        if self._thread is not None:
            raise RuntimeError("register adapters before start()")
        if self._mesh is not None:
            import jax

            # factors ride the mesh replicated; the merged kernels inherit
            # the base kernels' shardings through the jitted merge (GSPMD)
            lora = jax.tree.map(
                lambda x: jax.device_put(x, self._rep_sharding), lora
            )
        self._adapters[name] = (lora, float(scale))

    def _params_for(self, name: Optional[str]):
        """Backbone params for one adapter (None = base), merged lazily
        into an LRU of at most `_merged_cache_size` trees."""
        if name is None:
            return self.pipe.mmdit_params
        if name in self._merged:
            self._merged.move_to_end(name)
            return self._merged[name]
        import jax

        from tpdm_tpu.models.lora import apply_lora

        if self._merge_jit is None:
            self._merge_jit = jax.jit(apply_lora, static_argnames=("scale",))
        lora, scale = self._adapters[name]
        merged = self._merge_jit(self.pipe.mmdit_params, lora, scale=scale)
        self.adapter_merges += 1
        self._merged[name] = merged
        while len(self._merged) > self._merged_cache_size:
            self._merged.popitem(last=False)
        return merged

    def _pick_adapter(self, counts: dict):
        """Scheduling: which adapter does THIS segment run? Greedy
        max-runnable-slots, with a fairness floor — any adapter skipped
        `adapter_fair_every` consecutive segments while holding busy
        slots runs next (prevents a majority tenant starving a minority
        slot forever)."""
        if not counts:
            return None
        starved = [
            n for n in counts
            if self._adapter_skipped.get(n, 0) >= self.adapter_fair_every
        ]
        pool = starved or list(counts)
        active = max(pool, key=lambda n: (counts[n], n is None))
        for n in counts:
            if n == active:
                self._adapter_skipped[n] = 0
            else:
                self._adapter_skipped[n] = self._adapter_skipped.get(n, 0) + 1
        return active

    # -- compiled pieces ---------------------------------------------------
    def _build_device_functions(self):
        import jax
        import jax.numpy as jnp

        from tpdm_tpu.pipeline.denoise import make_cfg_denoise_fn
        from tpdm_tpu.pipeline.sampler import _clamp_ratio, _raw_to_alpha_beta
        from tpdm_tpu.ops.beta import beta_mode, beta_sample
        from tpdm_tpu.ops.flow_euler import flow_euler_step
        from tpdm_tpu.ops.flow_solver import flow_ab2_step

        pipe = self.pipe
        mcfg = pipe.mmdit.config
        self._mcfg = mcfg
        # non-default resolution: same model, different latent grid (the
        # pos-embed crop/regen is in-graph); one engine serves ONE shape —
        # MultiResContinuousRouter owns one engine per resolution
        self._lat_size = (
            self.resolution // self.vae_scale_factor
            if self.resolution is not None else mcfg.sample_size
        )
        token_grid = self._lat_size // mcfg.patch_size
        scfg_predict = self.predict
        gs = self.guidance_scale
        min_sigma = pipe.min_sigma
        relative = pipe.relative
        prediction_type = pipe.prediction_type
        max_steps = self.max_steps
        seg = self.seg_steps
        cache_n = self.cache_interval
        # "ab2": per-SEGMENT second-order integration (ops/flow_solver.py)
        # — (v_prev, sigma_prev) ride the scan carry and reset at every
        # segment boundary (first step of a segment is Euler via the
        # h_prev=0 degradation), exactly the per-segment Δ-cache pattern:
        # refilled slots need no special handling and no AB2 state crosses
        # the boundary. With the default seg_steps=4, 3 of 4 steps get the
        # second-order update.
        ab2 = self.solver == "ab2"

        # The serving uncond branch is always the empty prompt (zero ids,
        # matching BatchingEngine -> pipe.generate's zeros_like negatives):
        # encode it ONCE here — this also probes the embed shapes.
        c, t = self.tokenize("")
        probe = pipe.text_encoders.encode(np.zeros_like(c), np.zeros_like(t))
        if gs is not None:
            self._neg_pe = jnp.asarray(probe.prompt_embeds)  # (1, L, D)
            self._neg_pp = jnp.asarray(probe.pooled_prompt_embeds)  # (1, P)
        else:
            self._neg_pe = self._neg_pp = None

        # Mesh placement: slot-axis arrays shard over (data, fsdp) like the
        # trainer's batches; everything batch-1 or scalar replicates. All
        # jits below pin their out_shardings so the state NEVER silently
        # migrates off the mesh between segments/refills.
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tpdm_tpu.parallel.sharding import batch_spec

            mesh = self._mesh
            slot_sh = lambda ndim: NamedSharding(mesh, batch_spec(ndim))
            self._rep_sharding = NamedSharding(mesh, P())
            self._state_shardings = _SlotState(
                latents=slot_sh(4),
                sigma=slot_sh(1),
                steps=slot_sh(1),
                caps=slot_sh(1),
                pe=slot_sh(3),
                pp=slot_sh(2),
                key=self._rep_sharding,
                gs=slot_sh(1) if gs is not None else None,
                neg_pe=slot_sh(3) if gs is not None else None,
                neg_pp=slot_sh(2) if gs is not None else None,
            )
            self._trace_sharding = NamedSharding(
                mesh, P(None, ("data", "fsdp"))
            )
            if gs is not None:
                self._neg_pe = jax.device_put(self._neg_pe, self._rep_sharding)
                self._neg_pp = jax.device_put(self._neg_pp, self._rep_sharding)
        else:
            self._rep_sharding = None
            self._state_shardings = None
            self._trace_sharding = None

        # SamplerConfig stand-in for _clamp_ratio (only .relative/.epsilon)
        from tpdm_tpu.pipeline.sampler import SamplerConfig

        clamp_cfg = SamplerConfig(relative=relative)

        fused = self._fused_active

        def segment(mmdit_params, tpm_params, st: _SlotState, neg_pe, neg_pp,
                    live, bank=None, ids=None):
            """seg_steps adaptive steps; finished/empty slots frozen by mask.

            Step semantics mirror `adaptive_sample`'s body
            (pipeline/sampler.py body(): done-before-step masking, ratio
            clamp, per-sample Euler) so a slot's latent trajectory is
            identical to a solo `pipe.generate` run.

            ``live`` (S,) bool folds into the done-mask: slots whose
            adapter is NOT the one this segment's params were merged for
            freeze in place (time-multiplexed multi-tenant serving) —
            traced, so every adapter mix shares this one program.
            """
            # neg_pe/neg_pp args are legacy (the shared worker passes the
            # engine constants); per-slot negatives + guidance live IN the
            # state now so any per-request mix shares this one program
            del neg_pe, neg_pp
            if gs is not None:
                pe_full = jnp.concatenate([st.neg_pe, st.pe])
                pp_full = jnp.concatenate([st.neg_pp, st.pp])
            else:
                pe_full, pp_full = st.pe, st.pp
            if fused:
                # per-slot LoRA deltas INSIDE the backbone: one forward
                # advances every adapter in the pool (CFG batch is
                # [uncond slots; cond slots] -> ids repeat)
                import flax.linen as nn

                from tpdm_tpu.models.lora import lora_interceptor

                row_ids = (
                    jnp.concatenate([ids, ids]) if gs is not None else ids
                )

                def apply_fn(*a, **kw):
                    with nn.intercept_methods(
                        lora_interceptor(bank, row_ids)
                    ):
                        return pipe.mmdit.apply(mmdit_params, *a, **kw)

            else:
                apply_fn = lambda *a, **kw: pipe.mmdit.apply(
                    mmdit_params, *a, **kw
                )
            if cache_n:
                # per-SEGMENT Δ-residual caching: every segment starts with
                # a fresh cache (step i full when i % cache_n == 0, reuse
                # otherwise), so newly refilled slots are refreshed at
                # their first step and NO cache state crosses the segment
                # boundary — the engine's slot machinery is untouched.
                from tpdm_tpu.pipeline.denoise import (
                    make_cfg_denoise_cached_fns,
                )

                mode_apply = lambda mode: (
                    lambda l, t, pe_, pp_, d: apply_fn(
                        l, t, pe_, pp_, delta=d, cache_mode=mode
                    )
                )
                full_fn, reuse_fn = make_cfg_denoise_cached_fns(
                    mode_apply("record"), mode_apply("reuse"),
                    pe_full, pp_full,
                    st.gs if gs is not None else None,
                    token_grid, mcfg.patch_size,
                )
                denoise_fn = None
            else:
                denoise_fn = make_cfg_denoise_fn(
                    apply_fn,
                    pe_full,
                    pp_full,
                    st.gs if gs is not None else None,
                    token_grid,
                    mcfg.patch_size,
                )
            tpm_fn = lambda h, t: pipe.tpm.apply(tpm_params, h, t)

            def step(carry, i):
                if cache_n:
                    lat, sigma, steps, key, delta = carry
                    vel, temb, h, delta = jax.lax.cond(
                        (i % cache_n) != 0, reuse_fn, full_fn,
                        lat, sigma.astype(mcfg.dtype), delta,
                    )
                elif ab2:
                    lat, sigma, steps, key, v_prev, sig_prev = carry
                    vel, temb, h = denoise_fn(lat, sigma.astype(mcfg.dtype))
                else:
                    lat, sigma, steps, key = carry
                    vel, temb, h = denoise_fn(lat, sigma.astype(mcfg.dtype))
                raw = tpm_fn(h, temb).astype(jnp.float32)
                alpha, beta = _raw_to_alpha_beta(raw, prediction_type)
                key, sub = jax.random.split(key)
                if scfg_predict:
                    ratio = beta_mode(alpha, beta)
                else:
                    ratio = beta_sample(sub, alpha, beta)
                ratio = _clamp_ratio(ratio, sigma, clamp_cfg)
                sig_next = sigma * ratio if relative else sigma - ratio
                done = (sigma < min_sigma) | (steps >= st.caps) | ~live
                sig_next = jnp.where(done, sigma, sig_next)
                bcast = done.reshape((-1,) + (1,) * (lat.ndim - 1))
                if ab2:
                    upd = flow_ab2_step(
                        vel, v_prev, sig_next, sigma, sig_prev, lat
                    )
                else:
                    upd = flow_euler_step(vel, sig_next, sigma, lat)
                new_lat = jnp.where(bcast, lat, upd)
                new_steps = steps + (~done).astype(jnp.int32)
                if cache_n:
                    return (new_lat, sig_next, new_steps, key, delta), sig_next
                if ab2:
                    return (
                        (new_lat, sig_next, new_steps, key, vel, sigma),
                        sig_next,
                    )
                return (new_lat, sig_next, new_steps, key), sig_next

            if cache_n:
                init_delta = jnp.zeros(
                    (
                        st.latents.shape[0] * (2 if gs is not None else 1),
                        token_grid * token_grid,
                        mcfg.inner_dim,
                    ),
                    mcfg.dtype,
                )
                (lat, sigma, steps, key, _), trace = jax.lax.scan(
                    step,
                    (st.latents, st.sigma, st.steps, st.key, init_delta),
                    jnp.arange(seg),
                )
            elif ab2:
                # AB2 state is per-segment: v_prev=0 + sigma_prev=sigma
                # make the first step Euler (h_prev=0), then the carried
                # velocity upgrades the rest of the segment.
                (lat, sigma, steps, key, _, _), trace = jax.lax.scan(
                    step,
                    (st.latents, st.sigma, st.steps, st.key,
                     jnp.zeros_like(st.latents), st.sigma),
                    jnp.arange(seg),
                )
            else:
                (lat, sigma, steps, key), trace = jax.lax.scan(
                    step, (st.latents, st.sigma, st.steps, st.key),
                    jnp.arange(seg),
                )
            return (
                _SlotState(lat, sigma, steps, st.caps, st.pe, st.pp, key,
                           st.gs, st.neg_pe, st.neg_pp),
                trace,  # (seg, S) sigma-after-step
            )

        self._segment_params = (pipe.mmdit_params, pipe.tpm_params)
        self._min_live = min_sigma  # completion threshold on the carried scalar

        # pipelined dispatch holds references into segment k's output state
        # (sigma/steps for the deferred readback) while segment k+1 runs on
        # it — donation would delete those buffers under the reader
        donate = (
            ()
            if jax.default_backend() == "cpu" or self.pipeline_depth > 1
            else (2,)
        )
        self.segment_traces = 0
        self._segment = _jit_segment(
            self, segment, donate,
            (self._state_shardings, self._trace_sharding)
            if self._mesh is not None else None,
        )

        def assign(st, slot, lat, pe_row, pp_row, cap, sigma0, gs0,
                   npe_row, npp_row):
            """Slot refill as ONE jitted update (slot index, cap, starting
            sigma, guidance strength, and negative-embed rows are all
            traced — one compiled shape for any slot/cap/img2img-strength/
            guidance/negative mix); out_shardings keep the state on the
            serving mesh."""
            cfg_kw = {}
            if gs is not None:
                cfg_kw = dict(
                    gs=st.gs.at[slot].set(gs0),
                    neg_pe=st.neg_pe.at[slot].set(npe_row),
                    neg_pp=st.neg_pp.at[slot].set(npp_row),
                )
            return _SlotState(
                latents=st.latents.at[slot].set(lat),
                sigma=st.sigma.at[slot].set(sigma0),
                steps=st.steps.at[slot].set(0),
                caps=st.caps.at[slot].set(cap),
                pe=st.pe.at[slot].set(pe_row),
                pp=st.pp.at[slot].set(pp_row),
                key=st.key,
                **cfg_kw,
            )

        self._assign_fn = jax.jit(
            assign, out_shardings=self._state_shardings
        )

        S = self.slots

        def fresh_state():
            st = _fresh_state_impl()
            if self._mesh is not None:
                st = jax.tree.map(jax.device_put, st, self._state_shardings)
            return st

        def _fresh_state_impl():
            cfg_kw = {}
            if gs is not None:
                cfg_kw = dict(
                    gs=jnp.full((S,), float(gs), jnp.float32),
                    neg_pe=jnp.tile(self._neg_pe, (S, 1, 1)),
                    neg_pp=jnp.tile(self._neg_pp, (S, 1)),
                )
            return _SlotState(
                latents=jnp.zeros(
                    (S, mcfg.in_channels, self._lat_size, self._lat_size),
                    mcfg.dtype,
                ),
                sigma=jnp.zeros((S,), jnp.float32),
                steps=jnp.zeros((S,), jnp.int32),
                caps=jnp.full((S,), self.max_steps, jnp.int32),
                pe=jnp.zeros(
                    (S,) + probe.prompt_embeds.shape[1:],
                    probe.prompt_embeds.dtype,
                ),
                pp=jnp.zeros(
                    (S,) + probe.pooled_prompt_embeds.shape[1:],
                    probe.pooled_prompt_embeds.dtype,
                ),
                key=jax.random.PRNGKey(0),
                **cfg_kw,
            )

        self._fresh_state = fresh_state
        self._state = fresh_state()

    # -- host-side pieces --------------------------------------------------
    def _prompt_embeds(self, prompt: str):
        """LRU-cached batch-1 positive embeds for one prompt."""
        hit = self._embed_cache.get(prompt)
        if hit is not None:
            return hit
        c, t = self.tokenize(prompt)
        pe = self.pipe.text_encoders.encode(c, t)
        return self._embed_cache.put(
            prompt, (pe.prompt_embeds[0], pe.pooled_prompt_embeds[0])
        )

    def _neg_prompt_embeds(self, text: str):
        """Per-request negative-prompt embed rows, LRU-cached under a
        reserved key prefix so a prompt and a negative never collide
        ("" rides the engine's constant zero-ids negative instead)."""
        key = "\x00neg\x00" + text
        hit = self._embed_cache.get(key)
        if hit is not None:
            return hit
        c, t = self.tokenize(text)
        pe = self.pipe.text_encoders.encode(c, t)
        return self._embed_cache.put(
            key, (pe.prompt_embeds[0], pe.pooled_prompt_embeds[0])
        )

    def _init_latent(self, seed: int):
        """Same derivation as BatchingEngine/pipe.generate batch-1: the
        request's latent is split(PRNGKey(seed))[0] so (prompt, seed) images
        match every other entry path bit-for-bit (predict mode)."""
        import jax

        mcfg = self._mcfg
        key_lat = jax.random.split(jax.random.PRNGKey(seed))[0]
        return jax.random.normal(
            key_lat,
            (mcfg.in_channels, self._lat_size, self._lat_size),
            mcfg.dtype,
        )

    def _encode_image(self, image: "np.ndarray"):
        """uint8 (H, W, 3) -> (c, h, w) fp32 model-space latents (img2img)."""
        import jax.numpy as jnp

        return jnp.asarray(
            self.pipe.encode_image(np.asarray(image)[None]), jnp.float32
        )[0]

    def _slot_init(self, req: ServeRequest):
        """(latent row, starting carry scalar) for a fresh slot. t2i slots
        ride sigma 1.0 (pure noise); img2img slots mix the encoded init
        image into the SAME seed noise at `strength` and start there —
        identical math to BatchingEngine.generate_batch's img2img slots,
        so both engines produce the same (prompt, seed, image) results."""
        lat = self._init_latent(req.seed)
        if req.init_image is None:
            return lat, np.float32(1.0)
        import jax.numpy as jnp

        clean = self._encode_image(req.init_image)
        s = 0.6 if req.strength is None else float(req.strength)
        lat = ((1.0 - s) * clean + s * jnp.asarray(lat, jnp.float32)).astype(
            self._mcfg.dtype
        )
        return lat, np.float32(s)

    def _assign(self, slot: int, req: ServeRequest):
        import jax

        pe_row, pp_row = self._prompt_embeds(req.prompt)
        lat, sigma0 = self._slot_init(req)
        cap = min(req.steps or self.max_steps, self.max_steps)
        # per-request CFG state (SD3 engine, CFG on — its state carries
        # gs/neg rows). Family engines and CFG-off states take the dummy
        # branch: the assign fn ignores the operands, arity stays fixed.
        if getattr(self._state, "gs", None) is not None:
            gs0 = np.float32(
                self.guidance_scale if req.guidance_scale is None
                else req.guidance_scale
            )
            if req.negative_prompt:
                npe_row, npp_row = self._neg_prompt_embeds(
                    req.negative_prompt
                )
            else:
                npe_row, npp_row = self._neg_pe[0], self._neg_pp[0]
        else:
            gs0, npe_row, npp_row = np.float32(0.0), pe_row, pp_row
        if self._mesh is not None:
            # committed-device discipline: rows must live on the serving
            # mesh before they meet the mesh-committed state in the jit
            lat, pe_row, pp_row, npe_row, npp_row = (
                jax.device_put(x, self._rep_sharding)
                for x in (lat, pe_row, pp_row, npe_row, npp_row)
            )
        self._state = self._assign_fn(
            self._state, np.int32(slot), lat, pe_row, pp_row, np.int32(cap),
            sigma0, gs0, npe_row, npp_row,
        )
        self._slot_req[slot] = req
        self._slot_adapter[slot] = req.lora
        self._slot_sigmas[slot] = []
        self._steps_host[slot] = 0
        self._caps_host[slot] = cap

    def _decode_row(self, lat_row) -> "np.ndarray":
        """Batch-1 latent -> uint8 image (family-overridable)."""
        return self._decode_rows(lat_row)[0]

    def _decode_rows(self, lats) -> "np.ndarray":
        """(b, C, H, W) latents -> (b, H', W', 3) uint8 images."""
        from tpdm_tpu.utils.image import postprocess_images

        if self.pipe.vae is not None:
            return postprocess_images(self.pipe._decode(lats))
        return np.asarray(lats)

    def _finish(self, slot: int, nfe: int):
        """Free one finished slot: capture its latent row (an on-device
        slice — its buffer is independent of the recycled/donated state)
        and hand completion to the decode worker (or decode inline when no
        worker is running: warmup / async_decode=False)."""
        req = self._slot_req[slot]
        lat_row = self._state.latents[slot : slot + 1]
        if self._mesh is not None:
            import jax

            # the batch-1 decode runs replicated on the mesh (the VAE
            # params may themselves be sharded over it in mesh_shape mode)
            lat_row = jax.device_put(lat_row, self._rep_sharding)
        sigmas = [float(s) for s in self._slot_sigmas[slot][:nfe]]
        self._slot_req[slot] = None
        self._slot_adapter[slot] = None
        self._slot_sigmas[slot] = []
        if self._decode_thread is not None:
            self._decode_queue.put((req, lat_row, nfe, sigmas))
        else:
            self._complete(req, lat_row, nfe, sigmas)

    def _complete(self, req: ServeRequest, lat_row, nfe: int, sigmas: list):
        """Decode one finished latent (batch-1 jit) and resolve its request."""
        try:
            image = self._decode_row(lat_row)
        except BaseException as e:
            logger.exception("decode failed")
            req._error = e
            req._event.set()
            return
        req._result = {
            "image": image,
            "inference_steps": nfe,
            "sigmas": sigmas,
        }
        req._event.set()
        with self._lock:
            self.requests_done += 1
            self._nfe_done.append(nfe)
            self._latency_done.append(time.monotonic() - req.submitted_at)

    def _decode_worker(self):
        while True:
            item = self._decode_queue.get()
            if item is None:
                return
            done = False
            items = [item]
            # coalesce whatever other finishes are already waiting (burst
            # finishes are common: several slots cross min_sigma/cap in
            # the same segment) into one batched decode
            while len(items) < self.decode_batch:
                try:
                    nxt = self._decode_queue.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    done = True
                    break
                items.append(nxt)
            if len(items) == 1:
                self._complete(*items[0])
            else:
                self._complete_batch(items)
            if done:
                return

    def _complete_batch(self, items: list):
        """Decode several finished latents as ONE padded pow-2 batch.

        Pads by repeating the last row up to the next power of two, so
        at most log2(decode_batch) decode shapes ever compile; falls back
        to per-item batch-1 decodes if the batched program fails (keeps
        one bad latent from failing its batch peers)."""
        import jax.numpy as jnp

        n = len(items)
        bucket = 1
        while bucket < n:
            bucket *= 2
        rows = [it[1] for it in items]
        rows += [rows[-1]] * (bucket - n)
        try:
            images = self._decode_rows(jnp.concatenate(rows, axis=0))
        except BaseException:
            logger.exception(
                "batched decode failed; retrying the %d rows singly", n
            )
            for it in items:
                self._complete(*it)
            return
        with self._lock:
            self.decode_rows_coalesced += n
        for (req, _lat, nfe, sigmas), image in zip(items, images):
            req._result = {
                "image": np.asarray(image),
                "inference_steps": nfe,
                "sigmas": sigmas,
            }
            req._event.set()
            with self._lock:
                self.requests_done += 1
                self._nfe_done.append(nfe)
                self._latency_done.append(
                    time.monotonic() - req.submitted_at
                )

    def _refill(self, block: bool) -> bool:
        """Fill free slots from the queue. Returns False on shutdown.

        With adapters registered, free slots prefer pending requests whose
        adapter already holds slots (affinity keeps the time-multiplexed
        scheduler's runnable set large), bounded by aging — a request
        older than ``adapter_starvation_s`` seats FIFO regardless."""
        # drain the thread-safe queue into the worker-owned pending deque
        # (only the FIRST get may block, and only when nothing is pending)
        while True:
            try:
                req = self._queue.get(block=block and not self._pending)
            except queue.Empty:
                break
            block = False
            if req is None:
                return False
            self._pending.append(req)
        # load shedding: don't give an abandoned request a slot
        kept: "collections.deque" = collections.deque()
        for req in self._pending:
            if req.expired():
                req._expire()
                with self._lock:
                    self.requests_expired += 1
            else:
                kept.append(req)
        self._pending = kept
        free = [i for i in range(self.slots) if self._slot_req[i] is None]
        inflight = {
            self._slot_adapter[i]
            for i in range(self.slots)
            if self._slot_req[i] is not None
        }
        now = time.monotonic()
        for slot in free:
            if not self._pending:
                break
            idx = 0
            if (
                self._adapters
                and not self._fused_active  # fused: any mix advances together
                and inflight
                and now - self._pending[0].submitted_at
                <= self.adapter_starvation_s
            ):
                for j, r in enumerate(self._pending):
                    if r.lora in inflight:
                        idx = j
                        break
            req = self._pending[idx]
            del self._pending[idx]
            self._assign(slot, req)
            inflight.add(req.lora)
        return True

    def _run_segment(self):
        self._process_readback(self._dispatch_segment())

    def _dispatch_segment(self):
        """Enqueue one segment on the device; returns a readback entry for
        `_process_readback`. With pipeline_depth > 1 the worker dispatches
        ahead of the readbacks, so the device never idles on the
        per-segment host sync — numerically free because a slot that
        finished during segment k is frozen in-graph by the done-mask and
        simply no-ops through the speculatively dispatched k+1."""
        busy = [
            (i, self._slot_req[i])
            for i in range(self.slots)
            if self._slot_req[i] is not None
        ]
        # time-multiplexed adapters: ONE adapter's merged params per
        # segment, its peers frozen by the live-mask (no adapters in
        # flight -> base params, all-live — the common case)
        counts: dict = {}
        for i, _ in busy:
            a = self._slot_adapter[i]
            counts[a] = counts.get(a, 0) + 1
        if self._fused_active:
            # fused mode: every tenant advances in the same segment — base
            # params + all-live; per-slot bank ids route the deltas
            active = None
            live = np.ones((self.slots,), bool)
            ids = np.asarray(
                [
                    0 if a is None else self._adapter_ids[a]
                    for a in self._slot_adapter
                ],
                np.int32,
            )
            extra = (self._bank, ids)
            params = self._segment_params
        else:
            active = self._pick_adapter(counts)
            live = np.asarray(
                [self._slot_adapter[i] == active for i in range(self.slots)],
                bool,
            )
            extra = ()
            params = (
                self._segment_params if active is None
                else (self._params_for(active),) + self._segment_params[1:]
            )
        self._state, trace = self._segment(
            *params,
            self._state,
            self._neg_pe,
            self._neg_pp,
            live,
            *extra,
        )
        return (busy, counts, active, self._state.sigma, self._state.steps,
                trace)

    def _may_finish(self, entry) -> bool:
        """Will the oldest in-flight segment (predictably) free a slot?

        Step-cap finishes are host-predictable (`_steps_host` is exact
        through the segment before `entry`, because readbacks process in
        order); sigma-threshold early stops are not — those degrade to
        the one-segment recycle lag. Frozen multiplex slots may predict a
        finish that didn't execute; the cost is only a serial sync."""
        busy = entry[0]
        return any(
            self._slot_req[i] is req
            and self._steps_host[i] + self.seg_steps >= self._caps_host[i]
            for i, req in busy
        )

    def _process_readback(self, entry):
        """Fetch one dispatched segment's results; free finished slots.

        Entries MUST be processed in dispatch order: per-segment
        executed-step counts come from consecutive `_steps_host` deltas.
        A slot whose request changed since the entry's dispatch (finished
        at an earlier readback, then recycled) is skipped — that segment
        provably froze it (done-mask), and its host counters now belong
        to the new occupant."""
        import jax

        busy, counts, active, sigma_d, steps_d, trace_d = entry
        sigma, steps, trace = jax.device_get((sigma_d, steps_d, trace_d))
        with self._lock:
            self.segments_run += 1
            advanced = (
                [n for n in counts if n is not None]
                if self._fused_active
                else ([active] if active is not None else [])
            )
            for name in advanced:
                self.adapter_segments[name] = (
                    self.adapter_segments.get(name, 0) + 1
                )
            self.slot_steps_total += self.slots * self.seg_steps
        for i, req in busy:
            if self._slot_req[i] is not req:
                continue
            executed = int(steps[i] - self._steps_host[i])
            self._steps_host[i] = steps[i]
            with self._lock:
                self.slot_steps_active += executed
            self._slot_sigmas[i].extend(float(s) for s in trace[:executed, i])
            if sigma[i] < self._min_live or steps[i] >= self._caps_host[i]:
                self._finish(i, int(steps[i]))

    # -- public surface ----------------------------------------------------
    def submit(
        self, prompt: str, seed: int = 0, steps: Optional[int] = None,
        resolution: Optional[int] = None,
        deadline_s: Optional[float] = None,
        init_image: Optional["np.ndarray"] = None,
        strength: Optional[float] = None,
        guidance_scale: Optional[float] = None,
        negative_prompt: Optional[str] = None,
        lora: Optional[str] = None,
    ) -> ServeRequest:
        """Enqueue one request. `steps` caps THIS request's NFE (quality vs
        latency knob, clamped to the engine max) — slot recycling means a
        short request frees its slot early instead of riding out the batch.
        `deadline_s` sheds the request with RequestExpired if it is still
        QUEUED (no slot) that many seconds after submit.

        `init_image` (uint8 (H, W, 3) at the engine's served resolution)
        runs this request image-to-image: its slot starts at
        sigma = `strength` from the noised init latents, while other slots
        ride their own schedules — starting sigma is per-slot traced state,
        so img2img and text-to-image requests share the compiled segment.

        `guidance_scale` / `negative_prompt` (SD3 engine, CFG on) set THIS
        request's CFG strength / negative conditioning — per-slot traced
        state and per-slot embed rows, so any mix shares the compiled
        segment (guidance 1.0 = conditional-only arithmetic).

        `lora` names a registered adapter (``register_adapter``) this
        request runs under; None = the base model. Mixed-adapter slot
        pools time-multiplex segments per adapter (see register_adapter)."""
        if self._stop.is_set():
            raise EngineOverloaded("engine is stopped; no worker will run this")
        if steps is not None and steps < 1:
            raise ValueError("steps must be >= 1")
        if lora is not None and lora not in self._adapters:
            # registration gates which engines serve adapters (SD3:
            # both modes; families: fused-only)
            raise ValueError(f"unknown adapter {lora!r}")
        if guidance_scale is not None or negative_prompt:
            if self.pipe is None:
                raise ValueError(
                    "per-request guidance/negative prompts are SD3-only"
                )
            if self.guidance_scale is None:
                raise ValueError(
                    "per-request guidance/negative prompts need a "
                    "CFG-enabled engine (built with guidance_scale=None)"
                )
            if guidance_scale is not None and not np.isfinite(guidance_scale):
                raise ValueError(f"bad guidance_scale {guidance_scale}")
        if resolution is not None:
            raise ValueError(
                "slots share one compiled latent shape — serve multiple "
                "resolutions with MultiResContinuousRouter (or the "
                "fixed-batch engine's resolutions=)"
            )
        if init_image is not None:
            if self.pipe is None or self.pipe.vae is None:
                raise ValueError(
                    "img2img needs the SD3 pipeline engine with a VAE"
                )
            s = 0.6 if strength is None else float(strength)
            if not 0.0 < s <= 1.0:
                raise ValueError(f"strength must be in (0, 1], got {strength}")
            strength = s
            init_image = np.asarray(init_image)
            if init_image.ndim != 3 or init_image.shape[-1] != 3:
                raise ValueError("init_image must be (H, W, 3) uint8")
            px = self._lat_size * self.vae_scale_factor
            if init_image.shape[0] != px or init_image.shape[1] != px:
                raise ValueError(
                    f"init_image is {init_image.shape[0]}x"
                    f"{init_image.shape[1]}; this engine serves {px}x{px}"
                )
        elif strength is not None:
            raise ValueError("strength needs an init_image")
        req = ServeRequest(
            prompt=prompt, seed=seed, steps=steps, deadline_s=deadline_s,
            init_image=init_image, strength=strength,
            guidance_scale=(
                None if guidance_scale is None else float(guidance_scale)
            ),
            negative_prompt=negative_prompt or None,
            lora=lora,
        )
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            raise EngineOverloaded(
                f"request queue full ({self._queue.maxsize}); retry later"
            )
        if self._stop.is_set():
            # TOCTOU: stop() may have drained between check and enqueue
            self._drain_failed("engine stopped before this request ran")
            raise EngineOverloaded("engine is stopped; no worker will run this")
        return req

    def start(self):
        if self._thread is not None:
            return
        if self.fused_lora and self._adapters and self._bank is None:
            import jax

            from tpdm_tpu.models.lora import stack_adapters

            self._bank, self._adapter_ids = stack_adapters(self._adapters)
            if self._mesh is not None:
                self._bank = jax.tree.map(
                    lambda x: jax.device_put(x, self._rep_sharding),
                    self._bank,
                )
            self._fused_active = True
            # rebuild the compiled pieces: the fused segment takes the
            # factor bank + per-slot bank ids as extra traced operands
            self._build_device_functions()
        self._stop.clear()
        if self.async_decode:
            self._decode_thread = threading.Thread(
                target=self._decode_worker, daemon=True
            )
            self._decode_thread.start()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def stop(self):
        if self._thread is None:
            return
        self._stop.set()
        try:
            self._queue.put_nowait(None)
        except queue.Full:
            pass
        self._thread.join(timeout=60)
        self._thread = None
        if self._decode_thread is not None:
            # the segment worker is joined, so no new decodes arrive; let
            # the decode worker drain what's pending (those requests DID
            # finish denoising — they complete, not fail), then retire it
            self._decode_queue.put(None)
            self._decode_thread.join(timeout=60)
            self._decode_thread = None
        self._drain_failed("engine stopped before this request ran")
        # fail in-flight slot requests too: their segments will not resume
        had_inflight = False
        for i in range(self.slots):
            req = self._slot_req[i]
            if req is not None:
                had_inflight = True
                req._error = RuntimeError("engine stopped mid-generation")
                req._event.set()
                self._slot_req[i] = None
                self._slot_adapter[i] = None
                self._slot_sigmas[i] = []
        if had_inflight:  # restart begins from clean, all-empty slots
            self._state = self._fresh_state()
            self._steps_host[:] = 0
            self._caps_host[:] = self.max_steps

    def _drain_failed(self, message: str):
        def fail(req):
            req._error = RuntimeError(message)
            req._event.set()

        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                fail(req)
        # _pending is owned by the worker thread: drain it only once the
        # worker is no longer running (stop() joins before calling this;
        # submit()'s TOCTOU path may race a still-exiting worker and skips)
        if self._thread is None or not self._thread.is_alive():
            while self._pending:
                fail(self._pending.popleft())

    def _worker(self):
        # depth > 1: dispatched-but-unread segments, oldest first
        inflight: "collections.deque" = collections.deque()
        while not self._stop.is_set():
            have_work = (
                any(r is not None for r in self._slot_req) or bool(inflight)
            )
            try:
                if not self._refill(block=not have_work):
                    continue  # shutdown sentinel; loop re-checks _stop
            except BaseException:
                logger.exception("refill failed")
                continue
            if all(r is None for r in self._slot_req) and not inflight:
                continue
            try:
                if any(r is not None for r in self._slot_req):
                    if inflight and self._may_finish(inflight[0]):
                        # the oldest in-flight segment (predictably) frees
                        # a slot: take its sync NOW so the freed slot
                        # seats new work in the next dispatch instead of
                        # idling through it — for cap-driven traffic the
                        # pipelined engine then wastes ZERO slot-steps
                        # and only finish segments pay a serial sync
                        self._process_readback(inflight.popleft())
                        if not self._refill(block=False):
                            continue
                    if any(r is not None for r in self._slot_req):
                        inflight.append(self._dispatch_segment())
                # steady state keeps depth-1 segments running ahead of the
                # readback; when no dispatch happened (all slots empty)
                # drain what's in flight so finished slots free up
                if inflight and (
                    len(inflight) >= self.pipeline_depth
                    or all(r is None for r in self._slot_req)
                ):
                    self._process_readback(inflight.popleft())
            except BaseException as e:
                logger.exception("segment failed")
                for i in range(self.slots):
                    req = self._slot_req[i]
                    if req is not None:
                        req._error = e
                        req._event.set()
                        self._slot_req[i] = None
                        self._slot_sigmas[i] = []
                # the failed segment may have consumed (donated) the state
                # buffers — rebuild from scratch rather than touch them;
                # any other in-flight segment shares the poisoned chain
                inflight.clear()
                self._state = self._fresh_state()
                self._steps_host[:] = 0
                self._caps_host[:] = self.max_steps

    def warmup(self):
        """Compile the segment + encode + decode shapes before traffic."""
        req = ServeRequest(prompt="warmup", seed=0)
        self._assign(0, req)
        while self._slot_req[0] is not None:
            self._run_segment()
        # warmup is not traffic: reset the counters it touched
        with self._lock:
            self.segments_run = 0
            self.requests_done = 0
            self.slot_steps_total = 0
            self.slot_steps_active = 0
            self._nfe_done.clear()
            self._latency_done.clear()

    def stats(self) -> dict:
        with self._lock:
            nfes = list(self._nfe_done)
            lats = sorted(self._latency_done)
            out = {
                "segments_run": self.segments_run,
                "segment_traces": self.segment_traces,
                "requests_done": self.requests_done,
                "requests_expired": self.requests_expired,
                "slots": self.slots,
                "seg_steps": self.seg_steps,
                "solver": self.solver,
                "pipeline_depth": self.pipeline_depth,
                "decode_batch": self.decode_batch,
                "decode_rows_coalesced": self.decode_rows_coalesced,
                "slot_steps_total": self.slot_steps_total,
                "slot_steps_active": self.slot_steps_active,
                # fraction of slot-steps that advanced a real request —
                # the number static batching cannot keep high under NFE
                # variance (its finished slots idle until the batch max)
                "slot_utilization": (
                    self.slot_steps_active / self.slot_steps_total
                    if self.slot_steps_total
                    else 0.0
                ),
                "queue_depth": self._queue.qsize() + len(self._pending),
                "decode_pending": self._decode_queue.qsize(),
                "embed_cache_entries": len(self._embed_cache),
            }
            if self._adapters:
                out["adapter_merges"] = self.adapter_merges
                out["adapter_segments"] = dict(self.adapter_segments)
                out["lora_mode"] = (
                    "fused" if self.fused_lora else "multiplex"
                )
        if nfes:
            out["nfe_mean"] = float(np.mean(nfes))
            out["nfe_max"] = int(np.max(nfes))
        if lats:
            out["latency_s_p50"] = lats[len(lats) // 2]
            out["latency_s_p95"] = lats[min(len(lats) - 1, int(0.95 * len(lats)))]
        return out


class _AgentContinuousEngine(ContinuousBatchingEngine):
    """Shared plumbing for agent-backed family engines (SD1.5 / FLUX):
    construction from (agent, encode, decode), agent-param placement for
    dp / mesh_shape serving, per-seed latents and batch-1 decode."""

    #: attribute on the agent holding the frozen backbone params
    _backbone_attr: str = ""

    def __init__(
        self,
        agent,
        encode,
        decode=None,
        tpm_params=None,
        slots: int = 4,
        seg_steps: int = 4,
        max_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        predict: bool = True,
        queue_limit: Optional[int] = None,
        embed_cache_size: int = 256,
        dp: Optional[int] = None,
        mesh_shape: Optional[tuple] = None,
        async_decode: bool = True,
        fused_lora: bool = False,
        pipeline_depth: int = 1,
        decode_batch: int = 1,
    ):
        import jax

        self.agent = agent
        self._encode = encode
        self._decode_fn = decode
        self._tpm_params = (
            tpm_params if tpm_params is not None
            else agent.init_tpm_params(jax.random.PRNGKey(0))
        )
        super().__init__(
            pipe=None,
            tokenize=None,
            slots=slots,
            seg_steps=seg_steps,
            max_steps=max_steps or self._default_max_steps(),
            guidance_scale=(
                guidance_scale if guidance_scale is not None
                else self._default_guidance()
            ),
            predict=predict,
            queue_limit=queue_limit,
            embed_cache_size=embed_cache_size,
            dp=dp,
            mesh_shape=mesh_shape,
            async_decode=async_decode,
            fused_lora=fused_lora,
            pipeline_depth=pipeline_depth,
            decode_batch=decode_batch,
        )

    def register_adapter(
        self, name: str, lora: dict, scale: float = 1.0,
        merged_cache: int = 1,
    ):
        """Family engines serve adapters FUSED-ONLY: build the engine with
        ``fused_lora=True`` (per-slot rank-r deltas inside the backbone,
        models/lora.py lora_interceptor). There is no merged-tree
        multiplex path here — the agent owns its backbone params, and a
        12B-class FLUX merged copy per tenant would not fit anyway."""
        del merged_cache  # fused mode keeps factors only
        if not self.fused_lora:
            raise ValueError(
                "family engines serve adapters fused-only: build with "
                "fused_lora=True"
            )
        self._store_adapter(name, lora, scale)

    def _default_max_steps(self) -> int:
        raise NotImplementedError

    def _default_guidance(self) -> Optional[float]:
        """CFG scale used when the caller passes none (family-specific)."""
        return None

    def _setup_placement(self, dp, mesh_shape):
        """dp: replicate the agent's backbone over a data mesh.
        mesh_shape: shard ONE backbone instance via ``agent.shard(mesh)``
        (the training GSPMD specs); TPM replicates either way."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpdm_tpu.parallel.mesh import make_mesh

        devices = jax.devices()
        if dp is not None:
            if len(devices) < dp:
                raise ValueError(f"dp={dp} but only {len(devices)} devices")
            mesh = make_mesh(devices[:dp], data=dp, fsdp=1, tensor=1)
        else:
            d, f, t = mesh_shape
            n = d * f * t
            if len(devices) < n:
                raise ValueError(
                    f"mesh {mesh_shape} needs {n} devices, have {len(devices)}"
                )
            mesh = make_mesh(devices[:n], data=d, fsdp=f, tensor=t)
        rep = NamedSharding(mesh, P())
        place_rep = lambda tree: jax.tree.map(
            lambda x: jax.device_put(x, rep), tree
        )
        if dp is not None:
            setattr(
                self.agent, self._backbone_attr,
                place_rep(getattr(self.agent, self._backbone_attr)),
            )
        else:
            self.agent.shard(mesh)
        self._tpm_params = place_rep(self._tpm_params)
        return mesh

    def _mesh_shardings(self):
        """(rep, slot_sh, trace) shardings on the serving mesh, or Nones."""
        if self._mesh is None:
            return None, None, None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpdm_tpu.parallel.sharding import batch_spec

        mesh = self._mesh
        rep = NamedSharding(mesh, P())
        slot_sh = lambda ndim: NamedSharding(mesh, batch_spec(ndim))
        trace = NamedSharding(mesh, P(None, ("data", "fsdp")))
        return rep, slot_sh, trace

    def _init_latent(self, seed: int):
        import jax

        key_lat = jax.random.split(jax.random.PRNGKey(seed))[0]
        return self.agent.prepare_latents(key_lat, 1)[0]

    def _decode_rows(self, lats):
        if self._decode_fn is not None:
            return self._decode_fn(lats)
        return np.asarray(lats)

    def _cache_embeds(self, prompt: str, val):
        return self._embed_cache.put(prompt, val)


class ContinuousFluxEngine(_AgentContinuousEngine):
    """Slot-recycling serving for the FLUX family.

    Same segment semantics as the SD3 engine (the sigma-ratio adaptive
    loop is shared math), with packed-token denoise + embedded guidance
    instead of CFG batch-doubling. Supports the same multi-device modes as
    the SD3 engine: ``dp`` (weights replicated, slots over the data axis)
    and ``mesh_shape`` (backbone sharded via ``FluxAgent.shard`` — 12B
    bf16 REQUIRES fsdp>=2 on 16GB chips).
    Determinism: schedules/step counts exactly match a solo
    `make_flux_runner` run per (prompt, seed, cap); decoded images may
    differ by 1 uint8 LSB (segment scan at batch=slots vs solo while_loop
    are different XLA programs; last-ulp f32 drift can flip a pixel on a
    quantization boundary).

    Args:
        agent: a ``FluxAgent``.
        encode: ``(prompts) -> (txt (b, n, txt_dim), pooled (b, vec))``.
        decode: optional ``final_latents (b,c,h,w) -> uint8 images``
            (``tpdm_tpu.serving_families.make_vae_decoder``); None returns
            raw latents.
        tpm_params: TPM params (default: ``agent.init_tpm_params``).
    """

    _backbone_attr = "flux_params"

    def _default_max_steps(self) -> int:
        return self.agent.sampler_cfg.max_inference_steps

    def _build_device_functions(self):
        import jax
        import jax.numpy as jnp

        from tpdm_tpu.ops.beta import beta_mode, beta_sample
        from tpdm_tpu.ops.flow_euler import flow_euler_step
        from tpdm_tpu.pipeline.sampler import (
            SamplerConfig,
            _clamp_ratio,
            _raw_to_alpha_beta,
        )
        from tpdm_tpu.train.flux_agent import make_flux_denoise_fn

        agent = self.agent
        scfg = agent.sampler_cfg
        self._min_live = scfg.min_sigma
        seg = self.seg_steps
        S = self.slots
        predict = self.predict
        clamp_cfg = SamplerConfig(relative=scfg.relative, epsilon=scfg.epsilon)
        relative = scfg.relative
        prediction_type = scfg.prediction_type
        dtype = agent.flux.config.dtype

        txt_probe, pooled_probe = self._encode(["probe"])
        n_txt = txt_probe.shape[1]
        self._neg_pe = self._neg_pp = None
        rep, slot_sh, trace = self._mesh_shardings()
        self._rep_sharding, self._trace_sharding = rep, trace
        self._state_shardings = None if rep is None else _SlotState(
            latents=slot_sh(4), sigma=slot_sh(1), steps=slot_sh(1),
            caps=slot_sh(1), pe=slot_sh(3), pp=slot_sh(2), key=rep,
        )

        fused = self._fused_active

        def segment(flux_params, tpm_params, st: _SlotState, _neg_pe, _neg_pp,
                    live, bank=None, ids=None):
            txt_ids = jnp.zeros((S, n_txt, 3))
            if fused:
                # per-slot LoRA deltas inside the FLUX backbone (no CFG
                # batch doubling — guidance is embedded, rows == slots)
                import flax.linen as nn

                from tpdm_tpu.models.lora import lora_interceptor

                def apply_fn(*a):
                    with nn.intercept_methods(lora_interceptor(bank, ids)):
                        return agent.flux.apply(flux_params, *a)

            else:
                apply_fn = lambda *a: agent.flux.apply(flux_params, *a)
            denoise_fn = make_flux_denoise_fn(
                apply_fn,
                st.pe,
                txt_ids,
                st.pp,
                agent.guidance,
                (agent.latent_size, agent.latent_size),
            )
            tpm_fn = agent.tpm_fn(tpm_params)

            def step(carry, _):
                lat, sigma, steps, key = carry
                vel, temb, h = denoise_fn(lat, sigma.astype(dtype))
                raw = tpm_fn(h, temb).astype(jnp.float32)
                alpha, beta = _raw_to_alpha_beta(raw, prediction_type)
                key, sub = jax.random.split(key)
                if predict:
                    ratio = beta_mode(alpha, beta)
                else:
                    ratio = beta_sample(sub, alpha, beta)
                ratio = _clamp_ratio(ratio, sigma, clamp_cfg)
                sig_next = sigma * ratio if relative else sigma - ratio
                done = (sigma < scfg.min_sigma) | (steps >= st.caps) | ~live
                sig_next = jnp.where(done, sigma, sig_next)
                bcast = done.reshape((-1,) + (1,) * (lat.ndim - 1))
                new_lat = jnp.where(
                    bcast, lat, flow_euler_step(vel, sig_next, sigma, lat)
                )
                return (new_lat, sig_next,
                        steps + (~done).astype(jnp.int32), key), sig_next

            (lat, sigma, steps, key), trace = jax.lax.scan(
                step, (st.latents, st.sigma, st.steps, st.key), None, length=seg
            )
            return (
                _SlotState(lat, sigma, steps, st.caps, st.pe, st.pp, key),
                trace,
            )

        # pipelined dispatch holds references into segment k's output state
        # (sigma/steps for the deferred readback) while segment k+1 runs on
        # it — donation would delete those buffers under the reader
        donate = (
            ()
            if jax.default_backend() == "cpu" or self.pipeline_depth > 1
            else (2,)
        )
        self.segment_traces = 0
        self._segment = _jit_segment(
            self, segment, donate,
            (self._state_shardings, self._trace_sharding)
            if self._mesh is not None else None,
        )
        self._segment_params = (agent.flux_params, self._tpm_params)

        def assign(st, slot, lat, pe_row, pp_row, cap, sigma0,
                   _gs0, _npe, _npp):
            # trailing CFG operands unused (FLUX guidance is embedded);
            # uniform assign arity across the engine family
            return _SlotState(
                latents=st.latents.at[slot].set(lat),
                sigma=st.sigma.at[slot].set(sigma0),
                steps=st.steps.at[slot].set(0),
                caps=st.caps.at[slot].set(cap),
                pe=st.pe.at[slot].set(pe_row),
                pp=st.pp.at[slot].set(pp_row),
                key=st.key,
            )

        self._assign_fn = jax.jit(assign, out_shardings=self._state_shardings)

        def fresh_state():
            st = _SlotState(
                latents=jnp.zeros(
                    (S, agent.latent_channels, agent.latent_size,
                     agent.latent_size), dtype,
                ),
                sigma=jnp.zeros((S,), jnp.float32),
                steps=jnp.zeros((S,), jnp.int32),
                caps=jnp.full((S,), self.max_steps, jnp.int32),
                pe=jnp.zeros((S, n_txt, txt_probe.shape[-1]),
                             jnp.asarray(txt_probe).dtype),
                pp=jnp.zeros((S, pooled_probe.shape[-1]),
                             jnp.asarray(pooled_probe).dtype),
                key=jax.random.PRNGKey(0),
            )
            if self._mesh is not None:
                st = jax.tree.map(jax.device_put, st, self._state_shardings)
            return st

        self._fresh_state = fresh_state
        self._state = fresh_state()

    def _prompt_embeds(self, prompt: str):
        hit = self._embed_cache.get(prompt)  # PromptEmbedCache: get() bumps
        if hit is not None:
            return hit
        txt, pooled = self._encode([prompt])
        return self._cache_embeds(prompt, (txt[0], pooled[0]))


class _SD15SlotState(NamedTuple):
    """SD1.5 per-slot state: integer t (carried as float in `sigma` so the
    base host loop's completion check reads it uniformly) plus the
    DPM-Solver++ 2nd-order history (t_prev, x0_prev)."""

    latents: object  # (S, 4, h, w)
    sigma: object  # (S,) f32 — the integer timestep t; < min_time == done
    steps: object  # (S,) i32
    caps: object  # (S,) i32
    pe: object  # (S, n, d) positive CLIP embeds
    pp: object  # (S, P) the family's pooled conditioning row: (S, 1)
    # zeros for SD1.5 (no pooled input), pooled bigG (S, 1280) for
    # ContinuousSDXLEngine — set generically from pp_row in assign()
    key: object
    t_prev: object  # (S,) i32
    x0_prev: object  # (S, 4, h, w) f32


class ContinuousSD15Engine(_AgentContinuousEngine):
    """Slot-recycling serving for the SD1.5 family (integer-t adaptive
    DPM-Solver++ loop, modeling_sd_v1_5.py:816-849 semantics per slot).

    The segment body mirrors ``sd15_adaptive_sample``'s step exactly
    (done-before-step masking, truncated integer t decay, per-sample
    1st/2nd-order selection, terminal integrate-to-x0 at the per-request
    cap) so a slot's integer-t schedule equals a solo rollout's exactly;
    decoded images may differ by 1 uint8 LSB across the two differently
    compiled programs. Supports the same multi-device modes as the SD3
    engine: ``dp`` (UNet replicated, slots over the data axis) and
    ``mesh_shape`` (UNet sharded via ``SD15Agent.shard``).

    Args:
        agent: an ``SD15Agent``.
        encode: ``(prompts) -> (prompt_embeds, negative_prompt_embeds)``
            (the negative branch encodes the empty prompt).
        decode: optional ``final_latents -> uint8 images``; None returns
            raw latents.
        tpm_params: TPM params (default: ``agent.init_tpm_params``).
    """

    _backbone_attr = "unet_params"

    def _default_max_steps(self) -> int:
        return self.agent.sampler_cfg.num_inference_steps

    def _default_guidance(self) -> Optional[float]:
        return self.agent.guidance_scale

    def _slot_init(self, req: ServeRequest):
        # integer-t family: fresh slots start at t = 999 (img2img is
        # rejected in submit — no pipe/VAE on agent-backed engines)
        return self._init_latent(req.seed), np.float32(999.0)

    def _encode_probe(self):
        """Family hook: probe encode for state geometry.
        Returns (pe_probe, neg_pe (1, n, d), neg_pp or None, pp_row_shape)."""
        import jax.numpy as jnp

        pe, npe = self._encode(["probe"])
        return pe, jnp.asarray(npe[:1]), None, (1,)

    def _segment_denoise(self, apply_fn, st, neg_pe, neg_pp):
        """Family hook: build the (latents, t) -> (eps, temb, h) denoise
        closure for a segment from the slot state's conditioning rows.
        `apply_fn` is the (possibly LoRA-intercepted) backbone apply."""
        import jax.numpy as jnp

        from tpdm_tpu.train.sd15_agent import make_sd15_denoise_fn

        gs = self.guidance_scale
        pe_full = (
            jnp.concatenate([jnp.broadcast_to(neg_pe, st.pe.shape), st.pe])
            if gs is not None and gs > 1 else st.pe
        )
        return make_sd15_denoise_fn(apply_fn, pe_full, gs)

    def _backbone_apply(self, unet_params, bank, ids):
        """Backbone apply for one segment: base, or per-slot fused LoRA
        deltas (models/lora.py lora_interceptor). Under CFG the denoise
        closure doubles rows to [uncond; cond], so the per-row bank ids
        double too — both guidance branches get the slot's adapter, as
        diffusers applies LoRA."""
        agent = self.agent
        if bank is None:
            return lambda *a: agent.unet.apply(unet_params, *a)
        import flax.linen as nn
        import jax.numpy as jnp

        from tpdm_tpu.models.lora import lora_interceptor

        gs = self.guidance_scale
        row_ids = (
            jnp.concatenate([ids, ids]) if gs is not None and gs > 1 else ids
        )

        def apply_fn(*a):
            with nn.intercept_methods(lora_interceptor(bank, row_ids)):
                return agent.unet.apply(unet_params, *a)

        return apply_fn

    def _build_device_functions(self):
        import jax
        import jax.numpy as jnp

        from tpdm_tpu.ops.beta import beta_log_prob  # noqa: F401 (parity)
        from tpdm_tpu.ops.beta import beta_mode, beta_sample
        from tpdm_tpu.ops.dpm_solver import (
            ddpm_sigmas_from_betas,
            dpm_first_order_update,
            dpm_second_order_update,
            epsilon_to_x0,
        )
        agent = self.agent
        scfg = agent.sampler_cfg
        self._min_live = float(scfg.min_time)  # carried scalar is t
        seg = self.seg_steps
        S = self.slots
        predict = self.predict
        gs = self.guidance_scale
        eps_clip = scfg.epsilon
        solver_type = scfg.solver_type
        ucfg = agent.unet.config
        dtype = ucfg.dtype
        sigmas_table = ddpm_sigmas_from_betas()

        pe_probe, self._neg_pe, self._neg_pp, pp_shape = self._encode_probe()
        rep, slot_sh, trace = self._mesh_shardings()
        self._rep_sharding, self._trace_sharding = rep, trace
        self._state_shardings = None if rep is None else _SD15SlotState(
            latents=slot_sh(4), sigma=slot_sh(1), steps=slot_sh(1),
            caps=slot_sh(1), pe=slot_sh(3), pp=slot_sh(2), key=rep,
            t_prev=slot_sh(1), x0_prev=slot_sh(4),
        )
        if rep is not None:
            self._neg_pe = jax.device_put(self._neg_pe, rep)
            if self._neg_pp is not None:
                self._neg_pp = jax.device_put(self._neg_pp, rep)

        def segment(unet_params, tpm_params, st: _SD15SlotState, neg_pe, npp,
                    live, bank=None, ids=None):
            apply_fn = self._backbone_apply(unet_params, bank, ids)
            denoise_fn = self._segment_denoise(apply_fn, st, neg_pe, npp)
            tpm_fn = agent.tpm_fn(tpm_params)

            def step(carry, _):
                lat, t_f, steps, key, t_prev, x0_prev = carry
                t = t_f.astype(jnp.int32)
                eps_pred, temb, h = denoise_fn(lat, t.astype(jnp.float32))
                raw = tpm_fn(h, temb).astype(jnp.float32)
                alpha, beta = raw[:, 0], raw[:, 1]
                key, sub = jax.random.split(key)
                ratio = (
                    beta_mode(alpha, beta) if predict
                    else beta_sample(sub, alpha, beta)
                )
                ratio = jnp.clip(ratio, eps_clip, 1.0 - eps_clip)
                t_next = (t.astype(jnp.float32) * ratio).astype(jnp.int32)
                done = (t < scfg.min_time) | (steps >= st.caps) | ~live
                cap_now = (~done) & (steps >= st.caps - 1)
                t_next = jnp.where(cap_now, 0, t_next)

                lat32 = lat.astype(jnp.float32)
                eps32 = eps_pred.astype(jnp.float32)
                sigma_s0 = sigmas_table[t]
                sigma_s1 = sigmas_table[t_prev]
                sigma_t = jnp.where(cap_now, 0.0, sigmas_table[t_next])
                x0 = epsilon_to_x0(eps32, lat32, sigma_s0)
                first = dpm_first_order_update(x0, lat32, sigma_t, sigma_s0)
                second = dpm_second_order_update(
                    x0, x0_prev, lat32, sigma_t, sigma_s0, sigma_s1,
                    solver_type=solver_type,
                )
                use_first = (steps == 0) | (t_next == 0) | cap_now
                sel = use_first.reshape((-1,) + (1,) * (lat.ndim - 1))
                stepped = jnp.where(sel, first, second).astype(dtype)
                bcast = done.reshape((-1,) + (1,) * (lat.ndim - 1))
                new_lat = jnp.where(bcast, lat, stepped)
                new_t = jnp.where(done, t, t_next).astype(jnp.float32)
                new_t_prev = jnp.where(done, t_prev, t)
                new_x0_prev = jnp.where(bcast, x0_prev, x0)
                return (
                    new_lat, new_t, steps + (~done).astype(jnp.int32), key,
                    new_t_prev, new_x0_prev,
                ), new_t

            (lat, t_f, steps, key, t_prev, x0_prev), trace = jax.lax.scan(
                step,
                (st.latents, st.sigma, st.steps, st.key, st.t_prev, st.x0_prev),
                None, length=seg,
            )
            return (
                _SD15SlotState(lat, t_f, steps, st.caps, st.pe, st.pp, key,
                               t_prev, x0_prev),
                trace,
            )

        # pipelined dispatch holds references into segment k's output state
        # (sigma/steps for the deferred readback) while segment k+1 runs on
        # it — donation would delete those buffers under the reader
        donate = (
            ()
            if jax.default_backend() == "cpu" or self.pipeline_depth > 1
            else (2,)
        )
        self.segment_traces = 0
        self._segment = _jit_segment(
            self, segment, donate,
            (self._state_shardings, self._trace_sharding)
            if self._mesh is not None else None,
        )
        self._segment_params = (agent.unet_params, self._tpm_params)

        def assign(st, slot, lat, pe_row, pp_row, cap, sigma0,
                   _gs0, _npe, _npp):
            # sigma0 carries the starting integer t (999.0 from _slot_init;
            # uniform assign signature across the engine family — the
            # trailing CFG operands are the SD3 engine's, unused here)
            return _SD15SlotState(
                latents=st.latents.at[slot].set(lat),
                sigma=st.sigma.at[slot].set(sigma0),
                steps=st.steps.at[slot].set(0),
                caps=st.caps.at[slot].set(cap),
                pe=st.pe.at[slot].set(pe_row),
                # SD1.5's pp rows are (1,) zeros; SDXL stores pooled bigG
                pp=st.pp.at[slot].set(pp_row),
                key=st.key,
                t_prev=st.t_prev.at[slot].set(sigma0.astype(jnp.int32)),
                x0_prev=st.x0_prev.at[slot].set(0.0),
            )

        self._assign_fn = jax.jit(assign, out_shardings=self._state_shardings)

        def fresh_state():
            hw = (ucfg.in_channels, ucfg.sample_size, ucfg.sample_size)
            st = _SD15SlotState(
                latents=jnp.zeros((S,) + hw, dtype),
                sigma=jnp.zeros((S,), jnp.float32),
                steps=jnp.zeros((S,), jnp.int32),
                caps=jnp.full((S,), self.max_steps, jnp.int32),
                pe=jnp.zeros((S,) + jnp.asarray(pe_probe).shape[1:],
                             jnp.asarray(pe_probe).dtype),
                pp=jnp.zeros((S,) + pp_shape, jnp.float32),
                key=jax.random.PRNGKey(0),
                t_prev=jnp.full((S,), 999, jnp.int32),
                x0_prev=jnp.zeros((S,) + hw, jnp.float32),
            )
            if self._mesh is not None:
                st = jax.tree.map(jax.device_put, st, self._state_shardings)
            return st

        self._fresh_state = fresh_state
        self._state = fresh_state()

    def _prompt_embeds(self, prompt: str):
        hit = self._embed_cache.get(prompt)  # PromptEmbedCache: get() bumps
        if hit is not None:
            return hit
        pe, _ = self._encode([prompt])
        return self._cache_embeds(prompt, (pe[0], np.zeros((1,), np.float32)))


class ContinuousSDXLEngine(ContinuousSD15Engine):
    """Slot-recycling serving for the SDXL family (beyond-reference).

    Identical integer-t DPM-Solver++ segment machinery as the SD1.5
    engine; the slot state's ``pp`` field carries the pooled bigG text
    embedding and the denoise closure threads the text_time added
    conditioning (pooled + size/crop time_ids at the agent's native
    resolution) through classifier-free guidance.

    Micro-conditioning is FIXED per engine: every request is conditioned
    with ``agent.default_time_ids`` (native-resolution size/crop ids) —
    unlike the batch path (``batch["time_ids"]``), there is no
    per-request time_ids knob; slots share one compiled segment whose
    added-cond rows are uniform. Serve distinct time_ids from a separate
    engine instance (they are an offline aesthetic knob, not a
    per-request one, in the diffusers SDXL recipe too).

    Args:
        agent: an ``SDXLAgent``.
        encode: ``(prompts) -> (prompt_embeds, pooled, negative_prompt_
            embeds, negative_pooled)`` — the serve.py --family sdxl
            encode contract (make_sdxl_runner's).
    """

    def _encode_probe(self):
        import jax.numpy as jnp

        pe, pooled, npe, npooled = self._encode(["probe"])
        return (
            pe,
            jnp.asarray(npe[:1]),
            jnp.asarray(npooled[:1]),
            tuple(np.asarray(pooled).shape[1:]),
        )

    def _segment_denoise(self, apply_fn, st, neg_pe, neg_pp):
        import jax.numpy as jnp

        from tpdm_tpu.train.sdxl_agent import make_sdxl_denoise_fn

        gs = self.guidance_scale
        cfg_on = gs is not None and gs > 1
        pe_full = (
            jnp.concatenate([jnp.broadcast_to(neg_pe, st.pe.shape), st.pe])
            if cfg_on else st.pe
        )
        pp_full = (
            jnp.concatenate([jnp.broadcast_to(neg_pp, st.pp.shape), st.pp])
            if cfg_on else st.pp
        )
        added = {
            "text_embeds": pp_full,
            "time_ids": self.agent.default_time_ids(pe_full.shape[0]),
        }
        return make_sdxl_denoise_fn(apply_fn, pe_full, added, gs)

    def _prompt_embeds(self, prompt: str):
        hit = self._embed_cache.get(prompt)
        if hit is not None:
            return hit
        pe, pooled, _, _ = self._encode([prompt])
        return self._cache_embeds(prompt, (pe[0], pooled[0]))


class MultiResContinuousRouter:
    """Per-request output resolution for continuous batching.

    A ContinuousBatchingEngine compiles ONE latent shape for its slot
    pool, so a multi-resolution service runs one engine per served
    resolution — all sharing the same model params (each resolution is
    its own jitted segment program, like the fixed-batch engine's
    per-resolution sub-batches, tpdm_tpu/serving.py resolutions=) — and
    routes each request to its resolution's slot pool. Mirrors the
    reference's per-request width/height knob (gradio_sd3_inference.py:38-44).

    Args:
        pipe: the shared TPDMPipeline (SD3 family).
        tokenize: prompt -> (clip_ids, t5_ids).
        resolutions: extra output resolutions (image px) to serve besides
            the model default; each must divide by vae_scale_factor.
        default_resolution: resolution for requests that don't ask for
            one (default: the model's, sample_size * vae_scale_factor).
        slots / seg_steps / **engine_kw: forwarded to every per-resolution
            engine (slots is PER RESOLUTION).
    """

    def __init__(
        self,
        pipe,
        tokenize,
        resolutions,
        slots: int = 4,
        seg_steps: int = 4,
        vae_scale_factor: int = 8,
        default_resolution: Optional[int] = None,
        **engine_kw,
    ):
        mcfg = pipe.mmdit.config
        self.default_resolution = (
            default_resolution
            if default_resolution is not None
            else mcfg.sample_size * vae_scale_factor
        )
        served = set(resolutions or []) | {self.default_resolution}
        # ONE prompt-embed cache across all resolutions: embeds depend only
        # on the prompt, so a prompt served at N resolutions pays one cold
        # text-encode, not N
        shared_cache = PromptEmbedCache(
            engine_kw.pop("embed_cache_size", 256)
        )
        self._engines = {
            r: ContinuousBatchingEngine(
                pipe,
                tokenize,
                slots=slots,
                seg_steps=seg_steps,
                resolution=r,
                vae_scale_factor=vae_scale_factor,
                embed_cache=shared_cache,
                **engine_kw,
            )
            for r in sorted(served)
        }
        # submit() compatibility with the single-engine HTTP surface
        self.max_steps = self._engines[self.default_resolution].max_steps

    @property
    def resolutions(self):
        return sorted(self._engines)

    def submit(
        self, prompt: str, seed: int = 0, steps: Optional[int] = None,
        resolution: Optional[int] = None,
        deadline_s: Optional[float] = None,
        init_image: Optional["np.ndarray"] = None,
        strength: Optional[float] = None,
        guidance_scale: Optional[float] = None,
        negative_prompt: Optional[str] = None,
    ) -> ServeRequest:
        r = resolution if resolution is not None else self.default_resolution
        eng = self._engines.get(r)
        if eng is None:
            raise ValueError(
                f"resolution {r} not in the served set {self.resolutions}"
            )
        return eng.submit(prompt, seed=seed, steps=steps,
                          deadline_s=deadline_s,
                          init_image=init_image, strength=strength,
                          guidance_scale=guidance_scale,
                          negative_prompt=negative_prompt)

    def warmup(self):
        for eng in self._engines.values():
            eng.warmup()

    def start(self):
        for eng in self._engines.values():
            eng.start()

    def stop(self):
        for eng in self._engines.values():
            eng.stop()

    def stats(self) -> dict:
        per = {r: e.stats() for r, e in self._engines.items()}
        return {
            "resolutions": {str(r): s for r, s in per.items()},
            "requests_done": sum(s["requests_done"] for s in per.values()),
            "queue_depth": sum(s["queue_depth"] for s in per.values()),
        }
