"""Production serving engine: request batching + data-parallel replicas.

The reference serves one request at a time through a gradio callback
(reference: gradio_sd3_inference.py:18-84). TPU serving wants neither: a
v5e chip saturates around CFG-batch 2×4480 tokens but COMPILES per batch
shape, and a pod slice should serve N requests at once. This engine:

- queues incoming requests and coalesces them into fixed-size batches
  (padding the tail by repeating the last request, so ONE compiled shape
  serves every traffic level — no recompiles under load);
- optionally shards the batch over the `data` axis of a device mesh
  (data-parallel replica serving on a multi-chip slice; weights are
  replicated once at startup, batches split over ICI);
- keeps per-request determinism: each request's initial latent comes from
  its own seed, and the default predict=True path has no other sampling
  randomness (deterministic schedules, gradio_sd3_inference.py:45).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class EngineOverloaded(RuntimeError):
    """Raised by submit() when the request queue is at its limit."""


class RequestExpired(RuntimeError):
    """The request's deadline passed while it waited in the queue."""


@dataclass
class ServeRequest:
    prompt: str
    seed: int = 0
    # per-request step cap (quality/latency knob); None = engine default.
    # Honored slot-wise by ContinuousBatchingEngine; the fixed-batch engine
    # runs every batch to its max and cannot exploit per-request caps.
    steps: Optional[int] = None
    # per-request output resolution in image pixels; None = engine default.
    # Requests coalesce per-resolution (one compiled shape each).
    resolution: Optional[int] = None
    # load shedding: seconds this request may WAIT before starting; once
    # exceeded it fails with RequestExpired instead of occupying a batch
    # slot the client has already given up on. None = wait forever.
    deadline_s: Optional[float] = None
    # multi-tenant serving: name of a registered LoRA adapter
    # (BatchingEngine.register_adapter) this request should run under;
    # None = the base model. Requests coalesce per-adapter.
    lora: Optional[str] = None
    # image-to-image: uint8 (H, W, 3) init image (size must match the
    # request's served resolution) noised to `strength` — img2img and
    # text-to-image requests mix in ONE batch (t2i slots ride sigma 1.0).
    init_image: Optional[np.ndarray] = None
    strength: Optional[float] = None
    # per-request CFG strength; None = engine default. Traced (b,)-shaped
    # in the compiled program, so any mix runs on one shape (1.0 =
    # conditional-only arithmetic). Requires a CFG-enabled engine.
    guidance_scale: Optional[float] = None
    # per-request negative prompt; None/"" = the engine's constant empty
    # negative. Embedded through the same text towers + LRU cache as the
    # positive prompt.
    negative_prompt: Optional[str] = None
    submitted_at: float = field(default_factory=time.monotonic)
    _event: threading.Event = field(default_factory=threading.Event)
    _result: Optional[dict] = None
    _error: Optional[BaseException] = None

    def result(self, timeout: Optional[float] = None) -> dict:
        if not self._event.wait(timeout):
            raise TimeoutError("generation did not complete in time")
        if self._error is not None:
            raise self._error
        return self._result

    def expired(self) -> bool:
        return (
            self.deadline_s is not None
            and time.monotonic() - self.submitted_at > self.deadline_s
        )

    def _expire(self) -> None:
        self._error = RequestExpired(
            f"request waited >{self.deadline_s:.1f}s in the queue"
        )
        self._event.set()


def generate_ranked(
    engine,
    prompt: str,
    seed: int = 0,
    n: int = 4,
    steps: Optional[int] = None,
    ranker: Optional[Callable] = None,
    timeout: float = 600.0,
    lora: Optional[str] = None,
) -> dict:
    """Best-of-N generation: submit `n` seeds (seed..seed+n-1) for one
    prompt, optionally rank the candidates with an ImageReward ranker.

    Engine-agnostic (anything with submit/result — fixed-batch or
    continuous): the n candidates coalesce into batches / recycle slots
    like any other traffic. `ranker` is
    ``(prompt, images_uint8 (n,H,W,3)) -> (ranking, rewards)`` — see
    ``train.builders.build_inference_ranker``, the serving surface for the
    reference's list-ranking API (ImageReward.inference_rank,
    reference: src/reward_models/ImageReward/ImageReward.py:144-183).
    Returns {candidates, seeds[, ranking, rewards, best]} with ranking
    1-based in candidate order (1 = best) and best = argmax reward index.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    kw = {} if lora is None else {"lora": lora}
    reqs = [
        engine.submit(prompt, seed=seed + i, steps=steps, **kw)
        for i in range(n)
    ]
    results = [r.result(timeout=timeout) for r in reqs]
    out = {"candidates": results, "seeds": [seed + i for i in range(n)]}
    if ranker is not None:
        images = np.stack([np.asarray(r["image"]) for r in results])
        ranking, rewards = ranker(prompt, images)
        out["ranking"] = [int(x) for x in ranking]
        out["rewards"] = [float(x) for x in rewards]
        out["best"] = int(np.argmax(out["rewards"]))
    return out


def setup_dp_placement(pipe, dp: int):
    """Replicate every tower's weights over a ("data",)-axis mesh of the
    first `dp` devices. Mutates `pipe` params in place; returns
    (mesh, batch_sharding) — batches ride the data axis, one jitted
    program spans the replicas (GSPMD data parallelism). Shared by the
    fixed-batch and continuous engines."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpdm_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    if len(devices) < dp:
        raise ValueError(f"dp={dp} but only {len(devices)} devices")
    mesh = make_mesh(devices[:dp], data=dp, fsdp=1, tensor=1)
    rep = NamedSharding(mesh, P())
    place = lambda tree: jax.tree.map(lambda x: jax.device_put(x, rep), tree)
    pipe.mmdit_params = place(pipe.mmdit_params)
    pipe.tpm_params = place(pipe.tpm_params)
    if pipe.vae_params is not None:
        pipe.vae_params = place(pipe.vae_params)
    te = pipe.text_encoders
    if te is not None:
        te.clip_l = (te.clip_l[0], place(te.clip_l[1]))
        te.clip_g = (te.clip_g[0], place(te.clip_g[1]))
        if te.t5[1] is not None:
            te.t5 = (te.t5[0], place(te.t5[1]))
    return mesh, NamedSharding(mesh, P("data"))


def setup_mesh_placement(pipe, shape):
    """Sharded-model serving placement: ONE model instance spread over a
    (data, fsdp, tensor) mesh. Backbone kernels follow the training specs
    (tpdm_tpu.parallel.sharding); TPM and text towers replicate (tiny);
    the VAE's large conv kernels ZeRO-shard via the 4D rule. Mutates
    `pipe` params in place; returns (mesh, batch_sharding) with batches
    over (data, fsdp) like the trainer."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpdm_tpu.parallel.mesh import make_mesh
    from tpdm_tpu.parallel.sharding import batch_spec, shard_params

    d, f, t = shape
    n = d * f * t
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    mesh = make_mesh(devices[:n], data=d, fsdp=f, tensor=t)
    rep = NamedSharding(mesh, P())
    place_rep = lambda tree: jax.tree.map(
        lambda x: jax.device_put(x, rep), tree
    )
    pipe.mmdit_params = shard_params(pipe.mmdit_params, mesh)
    pipe.tpm_params = place_rep(pipe.tpm_params)
    if pipe.vae_params is not None:
        pipe.vae_params = shard_params(pipe.vae_params, mesh)
    te = pipe.text_encoders
    if te is not None:
        te.clip_l = (te.clip_l[0], place_rep(te.clip_l[1]))
        te.clip_g = (te.clip_g[0], place_rep(te.clip_g[1]))
        if te.t5[1] is not None:
            te.t5 = (te.t5[0], place_rep(te.t5[1]))
    return mesh, NamedSharding(mesh, batch_spec(4))


class BatchingEngine:
    """Coalesces requests into fixed-shape batches for one jitted pipeline.

    Args:
        pipe: a TPDMPipeline (or any object with the same generate surface).
        tokenize: prompt -> (clip_ids (1, 77), t5_ids (1, L)) numpy arrays.
        max_batch: compiled batch size; partial batches are padded to it.
        window_ms: how long to wait for more requests after the first.
        max_steps: adaptive-sampler step cap (gradio demo default 35).
        dp: if set, shard each batch over the first `dp` devices via a
            ("data",)-axis mesh. max_batch must be divisible by dp.
        mesh_shape: full (data, fsdp, tensor) serving mesh — beyond DP
            replicas: backbone/VAE weights sharded by the training specs
            (tpdm_tpu.parallel.sharding), batch over (data, fsdp). Use when
            one replica's weights should not be replicated per chip (e.g.
            FLUX-scale backbones) or to cut per-request latency via tensor
            parallelism. Mutually exclusive with dp.
        queue_limit: backpressure bound — submit() raises EngineOverloaded
            beyond this many queued requests (default 8x max_batch), so
            slow compiles / bursts surface as 503s instead of a silently
            growing queue of work nobody will wait for.
        split_stages: run the VAE decode as a separate dispatch so stats()
            can report true per-stage decode latency. Costs one extra
            host<->device round trip per batch (~190 ms over the tunnel),
            so it is OFF by default; turn on for capacity planning.
        runner: model-family escape hatch — a callable
            ``(prompts, seeds, caps) -> [ {image, inference_steps, sigmas}
            ... ]`` (all lists length max_batch, padded) that replaces the
            SD3 pipeline path entirely. Queueing, coalescing, padding, and
            stats stay in the engine; the runner owns tokenize/encode/
            sample/decode. See tpdm_tpu.serving_families for the SD1.5 and
            FLUX runners. Mutually exclusive with dp/mesh_shape (the
            runner owns its own device placement).
        embed_cache: LRU capacity for per-prompt text embeddings (0
            disables). A batch whose prompts (and the shared negative) are
            all cached skips the CLIP-L/G + T5 towers entirely — the big
            win is best-of-N (/rank) and repeated-prompt traffic, where
            every candidate shares one prompt. Rows are cached ON DEVICE
            (SD3-scale: ~2.7 MB bf16 per prompt at 333x4096), and a
            cached batch is numerically identical to an encoded one (the
            towers have no cross-batch coupling).
        resolutions: additional allowed per-request output resolutions in
            image pixels (the model-config default is always allowed).
            Requests coalesce per-resolution; each resolution is its own
            compiled shape (PatchEmbed center-crops/regenerates the pos
            table, so the backbone itself is size-flexible — the 2048px
            bench leg uses the same path). SD3-only (not runner families).
        vae_scale_factor: image-pixels per latent cell (SD3 VAE: 8; the
            toy VAE in tests: 2). Used to map resolutions to latent grids.
    """

    def __init__(
        self,
        pipe,
        tokenize: Callable[[str], tuple],
        max_batch: int = 4,
        window_ms: float = 25.0,
        max_steps: int = 35,
        guidance_scale: Optional[float] = 7.0,
        dp: Optional[int] = None,
        queue_limit: Optional[int] = None,
        split_stages: bool = False,
        mesh_shape: Optional[tuple] = None,
        runner: Optional[Callable] = None,
        embed_cache: int = 32,
        resolutions: Optional[Sequence[int]] = None,
        vae_scale_factor: int = 8,
        cache_interval: int = 0,
        guidance_interval: Optional[tuple] = None,
        cache_tau: float = 0.0,
        solver: str = "euler",
    ):
        import collections

        if runner is not None and resolutions:
            raise ValueError("per-request resolutions are SD3-pipeline-only")
        if runner is not None and (cache_interval or guidance_interval or cache_tau):
            raise ValueError(
                "cache_interval/guidance_interval on the engine apply to "
                "the SD3 pipeline path; family runners take them at "
                "construction (serving_families.make_*_runner)"
            )
        if solver not in ("euler", "ab2"):
            raise ValueError(
                "engine solver must be 'euler' or 'ab2' (the adaptive loop "
                f"has no two-eval solvers), got {solver!r}"
            )
        if runner is not None and solver != "euler":
            raise ValueError(
                "solver applies to the SD3 pipeline path; family runners "
                "own their sampler configs"
            )
        if cache_tau and cache_interval:
            raise ValueError(
                "cache_tau (input-aware policy) and cache_interval (fixed "
                "schedule) are mutually exclusive"
            )
        # cache_interval >= 2 composes with guidance_interval (the pipeline
        # builds the combined Δ-cache × interval denoise pair)
        if guidance_interval is not None and guidance_scale is None:
            raise ValueError(
                "guidance_interval requires classifier-free guidance "
                "(engine guidance_scale=None)"
            )

        if runner is not None and (dp is not None or mesh_shape is not None):
            raise ValueError(
                "runner owns its own placement; pass runner OR dp/mesh_shape"
            )
        if dp is not None and mesh_shape is not None:
            raise ValueError("pass dp OR mesh_shape, not both")
        if dp is not None and max_batch % dp != 0:
            raise ValueError(f"max_batch {max_batch} not divisible by dp {dp}")
        if mesh_shape is not None:
            bshards = mesh_shape[0] * mesh_shape[1]
            if max_batch % bshards != 0:
                raise ValueError(
                    f"max_batch {max_batch} not divisible by data*fsdp={bshards}"
                )
        self.pipe = pipe
        self.tokenize = tokenize
        self._runner = runner
        self.max_batch = max_batch
        self.window_ms = window_ms
        self.max_steps = max_steps
        self.guidance_scale = guidance_scale
        self.cache_interval = cache_interval
        self.guidance_interval = guidance_interval
        self.cache_tau = cache_tau
        self.solver = solver
        self.split_stages = split_stages
        self._queue: "queue.Queue[Optional[ServeRequest]]" = queue.Queue(
            maxsize=queue_limit if queue_limit is not None else 8 * max_batch
        )
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.batches_run = 0  # observability + test hook
        self.requests_expired = 0  # deadline load-shedding counter
        self.padded_slots = 0  # cumulative tail-padding waste (slots)
        # per-prompt text-embedding LRU: prompt -> (embed_row, pooled_row)
        # on device; the (constant) negative branch is cached separately
        self._embed_cache = (
            collections.OrderedDict() if embed_cache else None
        )
        self._embed_cache_size = embed_cache
        self._neg_embed = None
        self.embed_hits = 0
        self.embed_misses = 0
        self.vae_scale_factor = vae_scale_factor
        self.default_resolution = (
            pipe.mmdit.config.sample_size * vae_scale_factor
            if pipe is not None else None
        )
        self.resolutions = set(resolutions or [])
        if self.default_resolution is not None:
            self.resolutions.add(self.default_resolution)
        for r in self.resolutions:
            lat = r // vae_scale_factor
            if lat * vae_scale_factor != r or lat < 1:
                raise ValueError(
                    f"resolution {r} not a multiple of vae_scale_factor "
                    f"{vae_scale_factor}"
                )
        # deque(maxlen): worker appends while HTTP handler threads read
        # stats() — deque append/iteration is documented thread-safe
        self._stage_times: "collections.deque" = collections.deque(maxlen=256)
        # -- multi-tenant LoRA adapters (register_adapter) --
        # name -> (lora_factors, scale); merged backbone trees are
        # materialized lazily into an LRU of `merged_adapter_cache` entries
        # (each is a full backbone copy in HBM — size the cache to memory).
        self._adapters: dict = {}
        self._merged: "collections.OrderedDict" = collections.OrderedDict()
        self._merged_cache_size = 1
        self._base_mmdit_params = None
        self._merge_jit = None
        self.adapter_batches: dict = {}
        self.adapter_merges = 0  # LRU misses (full-tree merges paid)
        self._mesh = None
        self._data_sharding = None
        if dp is not None:
            self._setup_dp(dp)
        elif mesh_shape is not None:
            self._setup_mesh(mesh_shape)

    # -- data-parallel replicas -------------------------------------------
    def _setup_dp(self, dp: int):
        self._mesh, self._data_sharding = setup_dp_placement(self.pipe, dp)

    def _setup_mesh(self, shape):
        self._mesh, self._data_sharding = setup_mesh_placement(self.pipe, shape)

    # -- multi-tenant LoRA adapters ----------------------------------------
    def register_adapter(
        self, name: str, lora: dict, scale: float = 1.0,
        merged_cache: Optional[int] = None,
    ) -> None:
        """Serve a named LoRA adapter (train/draft.py factors) next to the
        base model: requests carrying ``lora=name`` run on
        ``apply_lora(base, lora, scale)`` — multi-tenant serving over ONE
        loaded backbone. Merged trees are materialized lazily into an LRU
        (``merged_cache`` entries, default 1; each entry is a full backbone
        copy in device memory). Adapter switches never recompile — params
        are jit ARGUMENTS of the pipeline (pipeline.py _jit_cache), so a
        swap is just different operands to the same executable.

        Not supported on runner families (the runner owns its params) or
        quantized (--int8/--int4) backbones (merging needs float kernels).
        """
        import jax
        import jax.numpy as jnp

        if self._runner is not None:
            raise ValueError(
                "adapters need the SD3 pipeline path; runner families own "
                "their own params"
            )
        if not name:
            raise ValueError("adapter name must be non-empty")
        if any(
            getattr(leaf, "dtype", None) in (jnp.int8, jnp.int4)
            for leaf in jax.tree.leaves(self.pipe.mmdit_params)
        ):
            raise ValueError(
                "cannot merge LoRA into a quantized backbone; serve float "
                "weights to use adapters"
            )
        if self._base_mmdit_params is None:
            self._base_mmdit_params = self.pipe.mmdit_params
        if self._mesh is not None:
            # factors must live on the serving mesh (replicated) so the
            # jitted merge sees consistent device assignments
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self._mesh, P())
            lora = jax.tree.map(lambda x: jax.device_put(x, rep), lora)
        self._adapters[name] = (lora, float(scale))
        self._merged.pop(name, None)  # re-registration invalidates the cache
        if merged_cache is not None:
            if merged_cache < 1:
                raise ValueError("merged_cache must be >= 1")
            self._merged_cache_size = merged_cache

    def _params_for(self, lora_name: Optional[str]):
        if lora_name is None:
            return (
                self._base_mmdit_params
                if self._base_mmdit_params is not None
                else self.pipe.mmdit_params
            )
        if lora_name not in self._adapters:
            raise ValueError(f"unknown adapter {lora_name!r}")
        if lora_name in self._merged:
            self._merged.move_to_end(lora_name)
            return self._merged[lora_name]
        import jax

        from tpdm_tpu.models.lora import apply_lora

        if self._merge_jit is None:
            self._merge_jit = jax.jit(apply_lora, static_argnames=("scale",))
        lora, scale = self._adapters[lora_name]
        merged = self._merge_jit(self._base_mmdit_params, lora, scale=scale)
        self.adapter_merges += 1
        self._merged[lora_name] = merged
        while len(self._merged) > self._merged_cache_size:
            self._merged.popitem(last=False)  # evict LRU; frees its HBM
        return merged

    def _place_batch(self, x):
        if self._data_sharding is None:
            return x
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        # rank-adaptive: shard the batch axis, replicate the rest — the
        # stored spec is latent-rank (4); embeds are rank 3/2
        spec = self._data_sharding.spec
        batch_axes = spec[0] if len(spec) else None
        s = NamedSharding(
            self._data_sharding.mesh,
            P(*([batch_axes] + [None] * (x.ndim - 1))),
        )
        return jax.device_put(x, s)

    # -- per-prompt embedding cache -----------------------------------------
    def _ensure_neg_embed(self, clip_ids, t5_ids):
        if self._neg_embed is None:
            ne1, npp1 = self.pipe.text_encoders.encode(
                np.zeros_like(clip_ids[:1]), np.zeros_like(t5_ids[:1])
            )
            self._neg_embed = (ne1[0], npp1[0])

    def _neg_rows(self, negatives, clip_ids, t5_ids):
        """Per-request negative-prompt embed rows. ""/None rides the
        engine's constant zero-ids negative (bit-identical to the
        historical single-negative path); non-empty texts embed through
        the same towers and LRU cache as positives, under a reserved
        key prefix so a prompt and a negative never collide."""
        import jax.numpy as jnp

        cache = self._embed_cache
        self._ensure_neg_embed(clip_ids, t5_ids)
        rows = []
        for text in negatives:
            if not text:
                rows.append(self._neg_embed)
                continue
            key = ("\x00neg", text)
            if key in cache:
                cache.move_to_end(key)
                self.embed_hits += 1
            else:
                c, t = self.tokenize(text)
                e, p = self.pipe.text_encoders.encode(c, t)
                cache[key] = (e[0], p[0])
                while len(cache) > self._embed_cache_size:
                    cache.popitem(last=False)
                self.embed_misses += 1
            rows.append(cache[key])
        ne = jnp.stack([r[0] for r in rows])
        npp = jnp.stack([r[1] for r in rows])
        return ne, npp

    def _embeds_for(self, prompts, clip_ids, t5_ids, negatives=None):
        """Return (pe, pp, ne, npp) for the padded batch, from the LRU
        embed cache when every prompt (and the constant negative branch)
        is cached, else by running the text towers once and filling the
        cache row-by-row. Cached and encoded batches are numerically
        identical — the towers have no cross-batch coupling.

        ``negatives`` (optional per-slot strings, ""/None = the constant
        empty negative) selects per-request negative prompts."""
        import jax.numpy as jnp

        cache = self._embed_cache
        b = len(prompts)
        need_neg = self.guidance_scale is not None
        if all(p in cache for p in prompts) and (
            not need_neg or self._neg_embed is not None
        ):
            for p in prompts:
                cache.move_to_end(p)
            pe = jnp.stack([cache[p][0] for p in prompts])
            pp = jnp.stack([cache[p][1] for p in prompts])
            self.embed_hits += b
        else:
            pe, pp = self.pipe.text_encoders.encode(clip_ids, t5_ids)
            for i, p in enumerate(prompts):
                if p in cache:
                    cache.move_to_end(p)
                else:
                    cache[p] = (pe[i], pp[i])
                    while len(cache) > self._embed_cache_size:
                        cache.popitem(last=False)
            if need_neg:
                self._ensure_neg_embed(clip_ids, t5_ids)
            self.embed_misses += b
        ne = npp = None
        if need_neg:
            if negatives is not None and any(negatives):
                ne, npp = self._neg_rows(negatives, clip_ids, t5_ids)
            else:
                self._ensure_neg_embed(clip_ids, t5_ids)
                ne = jnp.tile(self._neg_embed[0][None], (b, 1, 1))
                npp = jnp.tile(self._neg_embed[1][None], (b, 1))
        return (
            self._place_batch(pe),
            self._place_batch(pp),
            None if ne is None else self._place_batch(ne),
            None if npp is None else self._place_batch(npp),
        )

    # -- synchronous core ---------------------------------------------------
    def generate_batch(
        self, prompts: Sequence[str], seeds: Sequence[int],
        record_stats: bool = True, steps: Optional[Sequence] = None,
        resolution: Optional[int] = None, lora: Optional[str] = None,
        init_images: Optional[Sequence] = None,
        strengths: Optional[Sequence] = None,
        guidances: Optional[Sequence] = None,
        negative_prompts: Optional[Sequence] = None,
    ):
        """Run ONE padded fixed-shape batch; returns a per-request list of
        {image, inference_steps, sigmas}. ``record_stats=False`` (warmup)
        keeps the compile run out of the capacity-planning counters.

        ``steps`` (optional per-request ints, None entries = engine max)
        caps each request's NFE; caps are a traced argument so any mix runs
        on the one compiled shape — but the BATCH still pays its max cap
        (use the continuous engine to recycle short requests' slots).

        ``init_images``/``strengths`` (optional per-request, None entries =
        text-to-image) run img2img slots: the image is VAE-encoded and
        mixed into that slot's seed noise at its strength, with the slot's
        starting sigma set to the strength — both are traced (b,)-shaped
        arguments, so any t2i/img2img mix runs on the one compiled shape.

        ``guidances`` (optional per-request floats, None entries = engine
        default) sets per-request CFG strengths — also a traced (b,)
        argument, one compiled shape for any mix. Requires a CFG-enabled
        engine (guidance_scale is not None).

        ``negative_prompts`` (optional per-request strings, None/"" =
        the engine's constant empty negative) embeds per-request negative
        prompts through the same towers/cache as positives."""
        if lora is not None or self._adapters:
            if self._runner is not None:
                raise ValueError("adapters are SD3-pipeline-only")
            # swap the backbone operand for this batch; no recompile (params
            # are jit arguments). Restored in the finally so the shared
            # pipe is never left holding a merged tree (anything built on
            # pipe.mmdit_params afterwards — another engine, a bench —
            # must see the true base).
            self.pipe.mmdit_params = self._params_for(lora)
            try:
                return self._generate_batch_impl(
                    prompts, seeds, record_stats, steps, resolution, lora,
                    init_images, strengths, guidances, negative_prompts,
                )
            finally:
                self.pipe.mmdit_params = self._base_mmdit_params
        return self._generate_batch_impl(
            prompts, seeds, record_stats, steps, resolution, None,
            init_images, strengths, guidances, negative_prompts,
        )

    def _generate_batch_impl(
        self, prompts, seeds, record_stats, steps, resolution, lora,
        init_images, strengths, guidances, negative_prompts,
    ):
        # the adapter swap (and its restore) happened in generate_batch;
        # `lora` here only labels the stats rows
        import jax

        n = len(prompts)
        assert 0 < n <= self.max_batch
        pad = self.max_batch - n
        prompts = list(prompts) + [prompts[-1]] * pad
        seeds = list(seeds) + [seeds[-1]] * pad
        caps = [
            min(c or self.max_steps, self.max_steps)
            for c in (list(steps) if steps is not None else [None] * n)
        ]
        caps = caps + [caps[-1]] * pad
        imgs = list(init_images) if init_images is not None else [None] * n
        strs = list(strengths) if strengths is not None else [None] * n
        imgs = imgs + [imgs[-1]] * pad
        strs = strs + [strs[-1]] * pad
        any_i2i = any(im is not None for im in imgs)
        gds = list(guidances) if guidances is not None else [None] * n
        negs = [
            x or ""
            for x in (
                list(negative_prompts)
                if negative_prompts is not None else [None] * n
            )
        ]
        if (
            any(g is not None for g in gds) or any(negs)
        ) and self.guidance_scale is None:
            raise ValueError(
                "per-request guidance/negative prompts need a CFG-enabled "
                "engine (this one was built with guidance_scale=None)"
            )
        gds = gds + [gds[-1]] * pad
        negs = negs + [negs[-1]] * pad
        gs_batch = None
        if self.guidance_scale is not None:
            gs_batch = np.asarray(
                [
                    self.guidance_scale if g is None else float(g)
                    for g in gds
                ],
                np.float32,
            )

        if self._runner is not None:
            if any_i2i:
                raise ValueError("img2img is SD3-pipeline-engine-only")
            if any(g is not None for g in gds) or any(negs):
                raise ValueError(
                    "per-request guidance/negative prompts are "
                    "SD3-pipeline-engine-only"
                )
            t_start = time.monotonic()
            results = self._runner(prompts, seeds, caps)
            t_done = time.monotonic()
            if len(results) != self.max_batch:
                raise RuntimeError(
                    f"runner returned {len(results)} results for a padded "
                    f"batch of {self.max_batch}"
                )
            if record_stats:
                self.batches_run += 1
                self.padded_slots += pad
                self._stage_times.append(
                    {
                        "batch": n,
                        "padded": pad,
                        "device_s": t_done - t_start,
                        "total_s": t_done - t_start,
                    }
                )
            return results[:n]

        t_start = time.monotonic()
        clip_rows, t5_rows = [], []
        for p in prompts:
            c, t = self.tokenize(p)
            clip_rows.append(c[0])
            t5_rows.append(t[0])
        clip_ids = np.stack(clip_rows)
        t5_ids = np.stack(t5_rows)

        mcfg = self.pipe.mmdit.config
        if resolution is not None and resolution not in self.resolutions:
            raise ValueError(
                f"resolution {resolution} not in the served set "
                f"{sorted(self.resolutions)}"
            )
        lat_size = (
            resolution // self.vae_scale_factor
            if resolution is not None else mcfg.sample_size
        )
        # derive each request's latent EXACTLY as a batch-1 pipe.generate
        # with that seed would (key_lat = split(PRNGKey(seed))[0]), so the
        # HTTP path, --cli, and gradio produce identical images for the
        # same (prompt, seed); non-default resolutions use the same
        # derivation at their latent grid
        def _latent(s):
            key_lat = jax.random.split(jax.random.PRNGKey(s))[0]
            return np.asarray(
                jax.random.normal(
                    key_lat,
                    (1, mcfg.in_channels, lat_size, lat_size),
                    mcfg.dtype,
                )
            )[0]

        latents = np.stack([_latent(s) for s in seeds])
        init_sigma = None
        if any_i2i:
            # encode all img2img slots in one VAE-encode dispatch, then mix
            # each into its slot's seed noise at its strength; t2i slots
            # ride sigma 1.0 with x0=0 — identical math to pure noise, so
            # any mix shares the one compiled denoise program
            idx = [i for i, im in enumerate(imgs) if im is not None]
            clean = np.asarray(
                self.pipe.encode_image(np.stack([imgs[i] for i in idx])),
                np.float32,
            )
            sig = np.ones((self.max_batch,), np.float32)
            lat32 = latents.astype(np.float32)
            for j, i in enumerate(idx):
                s = 0.6 if strs[i] is None else float(strs[i])
                sig[i] = s
                lat32[i] = (1.0 - s) * clean[j] + s * lat32[i]
            latents = lat32.astype(latents.dtype)
            init_sigma = sig
        t_tokenized = time.monotonic()
        split = self.split_stages and self.pipe.vae is not None
        embeds = None
        if (
            self._embed_cache is not None
            and getattr(self.pipe, "text_encoders", None) is not None
        ):
            embeds = self._embeds_for(prompts, clip_ids, t5_ids, negs)
        t_encoded = time.monotonic()
        common = dict(
            latents=self._place_batch(latents),
            predict=True,
            max_inference_steps=self.max_steps,
            guidance_scale=(
                gs_batch if gs_batch is not None else self.guidance_scale
            ),
            decode=not split,
            step_caps=np.asarray(caps, np.int32),
            init_sigma=init_sigma,
            cache_interval=self.cache_interval,
            guidance_interval=self.guidance_interval,
            cache_tau=self.cache_tau,
            solver=self.solver,
        )
        if embeds is not None:
            res = self.pipe.generate(
                prompt_embeds=embeds[0],
                pooled_prompt_embeds=embeds[1],
                negative_prompt_embeds=embeds[2],
                negative_pooled_prompt_embeds=embeds[3],
                **common,
            )
        else:
            # ""-negative slots keep the historical zero-ids negative;
            # non-empty ones tokenize through the same path as positives
            nc = np.zeros_like(clip_ids)
            nt = np.zeros_like(t5_ids)
            for i, text in enumerate(negs):
                if text:
                    c, t = self.tokenize(text)
                    nc[i] = c[0]
                    nt[i] = t[0]
            res = self.pipe.generate(
                clip_ids=clip_ids,
                t5_ids=t5_ids,
                negative_clip_ids=nc,
                negative_t5_ids=nt,
                **common,
            )
        stage = {"batch": n, "padded": pad, "tokenize_s": t_tokenized - t_start}
        if resolution is not None:
            stage["resolution"] = resolution
        if lora is not None:
            stage["lora"] = lora
        if record_stats and (lora is not None or self._adapters):
            key = lora or "<base>"
            self.adapter_batches[key] = self.adapter_batches.get(key, 0) + 1
        if embeds is not None:
            stage["encode_s"] = t_encoded - t_tokenized
        if split:
            # res.images holds raw final latents (decode=False); the np
            # materialization in generate() already synced the denoise
            from tpdm_tpu.utils.image import postprocess_images

            t_denoised = time.monotonic()
            images = postprocess_images(self.pipe._decode(res.images))
            t_done = time.monotonic()
            stage["denoise_s"] = t_denoised - (
                t_encoded if embeds is not None else t_tokenized
            )
            stage["decode_s"] = t_done - t_denoised
        else:
            images = res.images
            t_done = time.monotonic()
        stage["device_s"] = t_done - (
            t_encoded if embeds is not None else t_tokenized
        )
        stage["total_s"] = t_done - t_start
        if record_stats:
            self.batches_run += 1
            self.padded_slots += pad
            self._stage_times.append(stage)
        out = []
        for i in range(n):
            nfe = int(res.last_valid_index[i]) + 1
            out.append(
                {
                    "image": images[i],
                    "inference_steps": nfe,
                    "sigmas": np.asarray(res.sigmas[i][:nfe]).tolist(),
                }
            )
        return out

    # -- async surface -------------------------------------------------------
    def submit(
        self, prompt: str, seed: int = 0, steps: Optional[int] = None,
        resolution: Optional[int] = None,
        deadline_s: Optional[float] = None,
        lora: Optional[str] = None,
        init_image: Optional[np.ndarray] = None,
        strength: Optional[float] = None,
        guidance_scale: Optional[float] = None,
        negative_prompt: Optional[str] = None,
    ) -> ServeRequest:
        if self._stop.is_set():
            # a request enqueued after stop() would never be processed and
            # leave the caller blocked until its result() timeout
            raise EngineOverloaded("engine is stopped; no worker will run this")
        if steps is not None and steps < 1:
            raise ValueError("steps must be >= 1")
        if guidance_scale is not None or negative_prompt:
            if self._runner is not None:
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
        if init_image is not None:
            if self._runner is not None or self.pipe.vae is None:
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
            px = (
                resolution if resolution is not None
                else self.pipe.mmdit.config.sample_size * self.vae_scale_factor
            )
            if init_image.shape[0] != px or init_image.shape[1] != px:
                raise ValueError(
                    f"init_image is {init_image.shape[0]}x"
                    f"{init_image.shape[1]}; this request serves {px}x{px}"
                )
        elif strength is not None:
            raise ValueError("strength needs an init_image")
        if resolution is not None:
            if self._runner is not None:
                raise ValueError("per-request resolutions are SD3-only")
            if resolution not in self.resolutions:
                raise ValueError(
                    f"resolution {resolution} not in the served set "
                    f"{sorted(self.resolutions)}"
                )
        if lora is not None and lora not in self._adapters:
            raise ValueError(
                f"unknown adapter {lora!r}; registered: "
                f"{sorted(self._adapters)}"
            )
        req = ServeRequest(
            prompt=prompt, seed=seed, steps=steps, resolution=resolution,
            deadline_s=deadline_s, lora=lora,
            init_image=init_image, strength=strength,
            guidance_scale=(
                None if guidance_scale is None else float(guidance_scale)
            ),
            negative_prompt=negative_prompt or None,
        )
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            raise EngineOverloaded(
                f"request queue full ({self._queue.maxsize}); retry later"
            )
        if self._stop.is_set():
            # TOCTOU window: stop() may have drained the queue between our
            # check above and the enqueue — re-drain so this request cannot
            # strand its caller until the result() timeout
            self._drain_failed("engine stopped before this request ran")
            raise EngineOverloaded("engine is stopped; no worker will run this")
        return req

    def start(self):
        if self._thread is not None:
            return
        self._stop.clear()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def stop(self):
        if self._thread is None:
            return
        self._stop.set()
        try:
            self._queue.put_nowait(None)  # wake the worker
        except queue.Full:
            pass  # worker is mid-batch; it checks _stop on the next loop
        self._thread.join(timeout=30)
        self._thread = None
        # fail any requests still queued so no waiter blocks forever
        self._drain_failed("engine stopped before this request ran")

    def _drain_failed(self, message: str):
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                req._error = RuntimeError(message)
                req._event.set()

    def _collect(self) -> List[ServeRequest]:
        """Block for the first request, then coalesce for window_ms."""
        first = self._queue.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.window_ms / 1000.0
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _worker(self):
        while not self._stop.is_set():
            batch = self._collect()
            # load shedding: a request whose deadline passed while queued
            # fails fast instead of occupying a padded batch slot its
            # client has already abandoned
            expired = [r for r in batch if r.expired()]
            for r in expired:
                r._expire()
            self.requests_expired += len(expired)
            batch = [r for r in batch if r not in expired]
            if not batch:
                continue
            # group by (resolution, adapter), first-seen order: each
            # resolution is its own compiled shape; each adapter is its own
            # backbone operand — mixed windows run as sub-batches
            groups: dict = {}
            for r in batch:
                groups.setdefault((r.resolution, r.lora), []).append(r)
            for (res_px, lora_name), group in groups.items():
                try:
                    now = time.monotonic()
                    waits = [now - r.submitted_at for r in group]
                    results = self.generate_batch(
                        [r.prompt for r in group],
                        [r.seed for r in group],
                        steps=[r.steps for r in group],
                        resolution=res_px,
                        lora=lora_name,
                        init_images=[r.init_image for r in group],
                        strengths=[r.strength for r in group],
                        guidances=[r.guidance_scale for r in group],
                        negative_prompts=[r.negative_prompt for r in group],
                    )
                    if self._stage_times:
                        self._stage_times[-1]["queue_wait_s_max"] = max(waits)
                    for req, res in zip(group, results):
                        req._result = res
                except BaseException as e:  # surface errors to every waiter
                    logger.exception("batch failed")
                    for req in group:
                        req._error = e
                finally:
                    for req in group:
                        req._event.set()

    def stats(self) -> dict:
        """Latency summary over recent batches (p50/p95 per stage) plus
        queue-wait, for dashboards/capacity planning."""
        rows = list(self._stage_times)
        if not rows:
            return {"batches_run": self.batches_run}

        def pct_of(vals, q):
            vals = sorted(vals)
            return vals[min(len(vals) - 1, int(q * len(vals)))]

        # runner-path records carry no tokenize_s (the runner owns
        # encoding); aggregate only the rows that report a given stage
        def pct(key, q):
            vals = [r[key] for r in rows if key in r]
            return pct_of(vals, q) if vals else 0.0

        waits = [r["queue_wait_s_max"] for r in rows if "queue_wait_s_max" in r]
        wait_stats = (
            {"queue_wait_s_max": max(waits),
             "queue_wait_s_p50": sorted(waits)[len(waits) // 2]}
            if waits else {}
        )
        decode_rows = [r for r in rows if "decode_s" in r]
        decode_stats = {}
        if decode_rows:
            decode_stats = {
                "denoise_s_p50": pct_of((r["denoise_s"] for r in decode_rows), 0.5),
                "denoise_s_p95": pct_of((r["denoise_s"] for r in decode_rows), 0.95),
                "decode_s_p50": pct_of((r["decode_s"] for r in decode_rows), 0.5),
                "decode_s_p95": pct_of((r["decode_s"] for r in decode_rows), 0.95),
            }
        adapter_stats = (
            {"adapter_batches": dict(self.adapter_batches),
             "adapter_merges": self.adapter_merges}
            if self._adapters else {}
        )
        return {
            "batches_run": self.batches_run,
            "requests_expired": self.requests_expired,
            "solver": self.solver,
            "recent": len(rows),
            **adapter_stats,
            **wait_stats,
            "batch_fill_mean": float(np.mean([r["batch"] for r in rows]))
            / self.max_batch,
            # requests whose batch skipped the text towers entirely
            "embed_cache_hits": self.embed_hits,
            "embed_cache_misses": self.embed_misses,
            # cumulative tail-padding waste: slots computed but thrown away
            "padded_slots": self.padded_slots,
            "padded_slot_frac": self.padded_slots
            / max(1, self.batches_run * self.max_batch),
            "tokenize_s_p50": pct("tokenize_s", 0.5),
            "tokenize_s_p95": pct("tokenize_s", 0.95),
            "device_s_p50": pct("device_s", 0.5),
            "device_s_p95": pct("device_s", 0.95),
            **decode_stats,
            "total_s_p50": pct("total_s", 0.5),
            "total_s_p95": pct("total_s", 0.95),
        }

    def warmup(self):
        """Compile the serving shape before taking traffic (not counted in
        stats — a padded warmup batch is not traffic waste)."""
        self.generate_batch(["warmup"], [0], record_stats=False)
