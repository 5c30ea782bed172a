"""Continuous-batching serving engine: slot recycling, parity, stats.

The engine's correctness claim is strong: with predict=True a request's
image must be BIT-IDENTICAL to the fixed-batch engine / pipe.generate for
the same (prompt, seed), no matter when the request joined a slot or what
shared its segments (tpdm_tpu/serving_continuous.py).
"""

import argparse
import threading
import time

import numpy as np
import pytest

from tpdm_tpu.serving import BatchingEngine, EngineOverloaded
from tpdm_tpu.serving_continuous import ContinuousBatchingEngine


def _toy_pipeline():
    import serve

    args = argparse.Namespace(toy=True, cpu=True, pretrained=None, tpm=None)
    return serve.build_pipeline(args)


@pytest.fixture(scope="module")
def toy():
    pipe, tokenize = _toy_pipeline()
    return pipe, tokenize


REQUESTS = [("a cat", 3), ("a dog on a hill", 7), ("blue bird", 11),
            ("a cat", 3), ("red square", 23)]


class TestContinuousParity:
    def test_bitwise_parity_with_fixed_batch_engine(self, toy):
        """5 requests through 2 slots (staggered joins, mixed slot peers)
        == each request run solo through the fixed-batch engine."""
        pipe, tokenize = toy
        ref_eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                 max_steps=6)
        want = {
            (p, s): ref_eng.generate_batch([p], [s])[0]
            for p, s in set(REQUESTS)
        }

        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=6)
        eng.start()
        try:
            reqs = [(p, s, eng.submit(p, seed=s)) for p, s in REQUESTS]
            for p, s, r in reqs:
                got = r.result(timeout=600)
                exp = want[(p, s)]
                assert got["inference_steps"] == exp["inference_steps"]
                # normally bit-identical, but the seg-scan and while_loop
                # are different jit programs: when foreign AOT cache
                # entries load, bf16 may round 1 ulp apart at a uint8
                # quantization boundary — allow the rare 1-level seam
                diff = np.abs(
                    got["image"].astype(np.int16)
                    - exp["image"].astype(np.int16)
                )
                assert diff.max() <= 1, diff.max()
                assert (diff > 0).mean() < 0.01
                # the f32 sigma traces come from two different jit graphs
                # (scan-segment vs while_loop) — XLA may fuse the
                # sigma*ratio chain differently, so allow float-ulp slack
                np.testing.assert_allclose(
                    got["sigmas"], exp["sigmas"], rtol=1e-5, atol=1e-8
                )
        finally:
            eng.stop()

    def test_max_steps_cap_parity(self, toy):
        """A request that never crosses min_sigma finishes at exactly the
        step cap with the same latents as the fixed-batch path."""
        pipe, tokenize = toy
        ref = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=3).generate_batch(["capped"], [5])[0]
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=2,
                                       max_steps=3)
        eng.start()
        try:
            got = eng.submit("capped", seed=5).result(timeout=600)
        finally:
            eng.stop()
        assert got["inference_steps"] == ref["inference_steps"] <= 3
        np.testing.assert_array_equal(got["image"], ref["image"])

    def test_segment_cache_seg1_is_exact(self, toy):
        """Per-segment Δ-caching with seg_steps=1: every segment step has
        index 0, so every forward is a full (record-mode) one — output
        must match the uncached engine to the cross-program seam
        tolerance. Pins that the cached segment program's step semantics
        are identical."""
        pipe, tokenize = toy
        base = ContinuousBatchingEngine(pipe, tokenize, slots=2,
                                        seg_steps=1, max_steps=5)
        fast = ContinuousBatchingEngine(pipe, tokenize, slots=2,
                                        seg_steps=1, max_steps=5,
                                        cache_interval=2)
        base.start(); fast.start()
        try:
            for prompt, seed in REQUESTS[:3]:
                a = base.submit(prompt, seed=seed).result(timeout=600)
                b = fast.submit(prompt, seed=seed).result(timeout=600)
                assert a["inference_steps"] == b["inference_steps"]
                diff = np.abs(a["image"].astype(np.int16)
                              - b["image"].astype(np.int16))
                assert diff.max() <= 1, diff.max()
                assert (diff > 0).mean() < 0.01
        finally:
            base.stop(); fast.stop()

    def test_segment_cache_mixed_traffic(self, toy):
        """Approximate per-segment caching (seg_steps=3, interval=3):
        mixed traffic completes, results are deterministic per (prompt,
        seed) regardless of slot peers, and slot recycling stays correct.
        Fresh Δ per segment means refilled slots never see a stale cache."""
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=3,
                                       max_steps=6, cache_interval=3)
        eng.start()
        try:
            first = [
                (p, s, eng.submit(p, seed=s)) for p, s in REQUESTS
            ]
            got1 = {(p, s): r.result(timeout=600) for p, s, r in first}
            # resubmit in a different order/mix: deterministic
            second = [
                (p, s, eng.submit(p, seed=s))
                for p, s in reversed(REQUESTS)
            ]
            for p, s, r in second:
                got = r.result(timeout=600)
                np.testing.assert_array_equal(
                    got["image"], got1[(p, s)]["image"]
                )
            for v in got1.values():
                assert np.isfinite(v["sigmas"]).all()
                assert 1 <= v["inference_steps"] <= 6
        finally:
            eng.stop()

    def test_one_compiled_shape_under_mixed_traffic(self, toy):
        """The segment jit must never recompile as slots churn."""
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=1,
                                       max_steps=4)
        eng.start()
        try:
            for p, s in REQUESTS:
                eng.submit(p, seed=s).result(timeout=600)
        finally:
            eng.stop()
        assert eng.segment_traces == 1


class TestPipelinedSegments:
    """pipeline_depth=2: the worker keeps one dispatched segment in
    flight ahead of the readback (hides the per-segment host sync).
    Numerics must be UNCHANGED: finished slots are frozen in-graph by the
    done-mask, so the speculative extra segment no-ops on them."""

    def test_parity_and_recycling_with_mixed_caps(self, toy):
        """5 requests, 2 slots, per-request step caps — recycling happens
        while a later segment is already in flight; every image still
        matches the solo fixed-batch run (documented 1-LSB program seam),
        and per-request NFE/sigma traces are exact."""
        pipe, tokenize = toy
        jobs = [("a cat", 3, 6), ("a dog on a hill", 7, 3),
                ("blue bird", 11, 5), ("a cat", 3, 6), ("red square", 23, 2)]
        ref_eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                 max_steps=6)
        want = {
            j: ref_eng.generate_batch([j[0]], [j[1]], steps=[j[2]])[0]
            for j in set(jobs)
        }

        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=6, pipeline_depth=2)
        eng.start()
        try:
            reqs = [(j, eng.submit(j[0], seed=j[1], steps=j[2]))
                    for j in jobs]
            for j, r in reqs:
                got = r.result(timeout=600)
                exp = want[j]
                assert got["inference_steps"] == exp["inference_steps"], j
                diff = np.abs(
                    got["image"].astype(np.int16)
                    - exp["image"].astype(np.int16)
                )
                assert diff.max() <= 1, (j, diff.max())
                np.testing.assert_allclose(
                    got["sigmas"], exp["sigmas"], rtol=1e-5, atol=1e-8
                )
        finally:
            eng.stop()
        st = eng.stats()
        assert st["pipeline_depth"] == 2
        assert st["requests_done"] == 5
        # per-request accounting survives out-of-order slot recycling
        assert st["slot_steps_active"] == sum(
            want[j]["inference_steps"] for j in jobs
        )
        assert eng.segment_traces == 1  # still one compiled shape

        # cap-driven finishes are host-predictable: the worker drains the
        # pipeline right before a segment that recycles a slot, so depth-2
        # pays ZERO wasted segments vs a synchronous depth-1 run
        eng1 = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                        max_steps=6)
        eng1.start()
        try:
            for j, r in [(j, eng1.submit(j[0], seed=j[1], steps=j[2]))
                         for j in jobs]:
                r.result(timeout=600)
        finally:
            eng1.stop()
        assert st["segments_run"] == eng1.stats()["segments_run"]
        assert st["slot_utilization"] == eng1.stats()["slot_utilization"]

    def test_depth_one_is_default_and_validated(self, toy):
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=1,
                                       max_steps=2)
        assert eng.pipeline_depth == 1
        with pytest.raises(ValueError, match="pipeline_depth"):
            ContinuousBatchingEngine(pipe, tokenize, slots=1,
                                     pipeline_depth=0)

    def test_pipelined_fused_adapters(self, toy):
        """Pipelining composes with fused multi-tenant LoRA (both change
        the segment's dispatch path)."""
        import jax

        pipe, tokenize = toy
        lora = _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(1))
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=4, fused_lora=True,
                                       pipeline_depth=2)
        eng.register_adapter("a", lora)
        eng.start()
        try:
            rb = eng.submit("a cat", seed=7)
            rt = eng.submit("a cat", seed=7, lora="a")
            base = rb.result(timeout=600)["image"]
            tuned = rt.result(timeout=600)["image"]
        finally:
            eng.stop()
        assert np.abs(
            base.astype(np.int16) - tuned.astype(np.int16)
        ).max() > 1


class TestBatchedDecode:
    """decode_batch > 1: the async decode worker coalesces finished slots
    already waiting in its queue into one padded pow-2 batched VAE decode
    (docs/PERF.md: the SD3 decode amortizes 102 -> 79 ms/img batched)."""

    def test_worker_coalesces_and_matches_single_decode(self, toy):
        """Deterministic: pre-fill the decode queue, run the worker body
        synchronously — 3 waiting rows decode as one (padded-to-4) batch
        and each image matches its batch-1 decode (program seam only)."""
        import jax
        from tpdm_tpu.serving_continuous import ServeRequest

        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=1,
                                       max_steps=2, decode_batch=4)
        lats = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 8, 8))
        reqs = [ServeRequest(prompt=f"p{i}", seed=i) for i in range(3)]
        for i, r in enumerate(reqs):
            eng._decode_queue.put((r, lats[i : i + 1], 2, [1.0, 0.5]))
        eng._decode_queue.put(None)
        eng._decode_worker()  # returns at the sentinel
        singles = [eng._decode_row(lats[i : i + 1]) for i in range(3)]
        for r, want in zip(reqs, singles):
            got = r.result(timeout=1)
            assert got["inference_steps"] == 2
            diff = np.abs(
                got["image"].astype(np.int16) - want.astype(np.int16)
            )
            assert diff.max() <= 1, diff.max()
        assert eng.decode_rows_coalesced == 3
        assert eng.stats()["decode_rows_coalesced"] == 3

    def test_end_to_end_parity_with_batched_decode(self, toy):
        """4 same-cap requests through 4 slots finish together; whatever
        coalescing the race produces, every image still matches the solo
        fixed-batch run."""
        pipe, tokenize = toy
        ref_eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                 max_steps=4)
        jobs = [("a cat", 3), ("a dog on a hill", 7), ("blue bird", 11),
                ("red square", 23)]
        want = {
            (p, s): ref_eng.generate_batch([p], [s])[0] for p, s in jobs
        }
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=4, seg_steps=4,
                                       max_steps=4, decode_batch=4)
        eng.start()
        try:
            reqs = [(p, s, eng.submit(p, seed=s)) for p, s in jobs]
            for p, s, r in reqs:
                got = r.result(timeout=600)
                exp = want[(p, s)]
                assert got["inference_steps"] == exp["inference_steps"]
                diff = np.abs(
                    got["image"].astype(np.int16)
                    - exp["image"].astype(np.int16)
                )
                assert diff.max() <= 1, ((p, s), diff.max())
        finally:
            eng.stop()

    def test_batched_decode_failure_falls_back_to_single_rows(self, toy):
        """A failing batched decode program must not fail its batch peers:
        the worker retries each row singly."""
        import jax
        from tpdm_tpu.serving_continuous import ServeRequest

        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=1,
                                       max_steps=2, decode_batch=4)
        real = eng._decode_rows

        def flaky(lats):
            if lats.shape[0] > 1:
                raise RuntimeError("synthetic batched-decode failure")
            return real(lats)

        eng._decode_rows = flaky
        lats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8, 8))
        reqs = [ServeRequest(prompt=f"p{i}", seed=i) for i in range(2)]
        for i, r in enumerate(reqs):
            eng._decode_queue.put((r, lats[i : i + 1], 1, [1.0]))
        eng._decode_queue.put(None)
        eng._decode_worker()
        for i, r in enumerate(reqs):
            got = r.result(timeout=1)
            np.testing.assert_array_equal(
                got["image"], real(lats[i : i + 1])[0]
            )
        assert eng.decode_rows_coalesced == 0

    def test_validation(self, toy):
        pipe, tokenize = toy
        with pytest.raises(ValueError, match="decode_batch"):
            ContinuousBatchingEngine(pipe, tokenize, slots=1, decode_batch=0)


class TestSlotRecycling:
    def test_utilization_accounting(self, toy):
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=1,
                                       max_steps=4)
        eng.start()
        try:
            reqs = [eng.submit(p, seed=s) for p, s in REQUESTS[:4]]
            nfes = [r.result(timeout=600)["inference_steps"] for r in reqs]
        finally:
            eng.stop()
        s = eng.stats()
        assert s["requests_done"] == 4
        assert s["slot_steps_active"] == sum(nfes)
        assert s["slot_steps_total"] >= s["slot_steps_active"]
        assert 0 < s["slot_utilization"] <= 1.0
        assert s["nfe_mean"] == pytest.approx(np.mean(nfes))
        # seg_steps=1 with a saturated queue: every segment advances at
        # least one real request, so waste only appears at the tail drain
        assert s["slot_utilization"] >= 0.5

    def test_embed_cache_dedupes_repeat_prompts(self, toy):
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=2,
                                       max_steps=3, embed_cache_size=8)
        eng.start()
        try:
            for seed in (1, 2, 3):
                eng.submit("same prompt", seed=seed).result(timeout=600)
        finally:
            eng.stop()
        assert eng.stats()["embed_cache_entries"] == 1

    def test_warmup_compiles_without_counting_traffic(self, toy):
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=3)
        eng.warmup()
        s = eng.stats()
        assert s["requests_done"] == 0 and s["segments_run"] == 0
        eng.start()
        try:
            assert eng.submit("after warmup").result(timeout=600)[
                "inference_steps"] >= 1
        finally:
            eng.stop()


class TestPerRequestSteps:
    """Per-request step caps (ServeRequest.steps) across both engines."""

    def test_fixed_batch_engine_honors_mixed_caps(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=3, window_ms=1,
                             max_steps=6)
        # same compiled batch shape for the reference run: different batch
        # shapes are different XLA programs (uint8 rounding may differ 1 LSB)
        solo2 = eng.generate_batch(["a"], [1], steps=[2])[0]
        out = eng.generate_batch(["a", "b", "c"], [1, 2, 3],
                                 steps=[2, None, 4])
        assert out[0]["inference_steps"] == 2
        assert out[2]["inference_steps"] <= 4
        assert len(out[0]["sigmas"]) == 2
        # capped request in a mixed batch == capped solo run, bit for bit
        np.testing.assert_array_equal(out[0]["image"], solo2["image"])
        # caps are a traced argument: no recompile across cap mixes
        n_sigs = len(pipe._jit_cache)
        eng.generate_batch(["a", "b", "c"], [1, 2, 3], steps=[5, 1, None])
        assert len(pipe._jit_cache) == n_sigs

    def test_cap_matches_engine_with_smaller_max_steps(self, toy):
        """steps=k must reproduce an engine whose compiled max IS k."""
        pipe, tokenize = toy
        small = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                               max_steps=3).generate_batch(["p"], [9])[0]
        capped = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                max_steps=6).generate_batch(
                                    ["p"], [9], steps=[3])[0]
        assert capped["inference_steps"] == small["inference_steps"]
        np.testing.assert_array_equal(capped["image"], small["image"])

    def test_continuous_engine_matches_fixed_engine_per_cap(self, toy):
        pipe, tokenize = toy
        ref_eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                 max_steps=6)
        want = {k: ref_eng.generate_batch(["vary"], [5], steps=[k])[0]
                for k in (1, 3, 6)}
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=6)
        eng.start()
        try:
            reqs = {k: eng.submit("vary", seed=5, steps=k) for k in (1, 3, 6)}
            for k, r in reqs.items():
                got = r.result(timeout=600)
                assert got["inference_steps"] == want[k]["inference_steps"]
                # different jit programs (seg-step vs whole-loop) may round
                # bf16 1 ulp apart at a uint8 quantization boundary: allow
                # the rare 1-level seam, never more
                diff = np.abs(
                    got["image"].astype(np.int16)
                    - want[k]["image"].astype(np.int16)
                )
                assert diff.max() <= 1, diff.max()
                assert (diff > 0).mean() < 0.01
        finally:
            eng.stop()

    def test_submit_rejects_bad_steps(self, toy):
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=1)
        with pytest.raises(ValueError, match="steps"):
            eng.submit("x", steps=0)
        feng = BatchingEngine(pipe, tokenize, max_batch=1)
        with pytest.raises(ValueError, match="steps"):
            feng.submit("x", steps=-1)


class TestMeshContinuous:
    """Slot-axis sharding over a device mesh (dp and mesh_shape modes).

    Each test builds a FRESH pipeline: placement setup commits the params
    to the mesh in place, which must not leak into the shared fixture.
    Images may differ by 1 uint8 LSB from the single-device reference —
    a differently-partitioned XLA program may round differently — but
    step counts and schedules must match exactly.
    """

    def _reference(self, toy, caps):
        pipe, tokenize = toy
        ref = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=6)
        return {k: ref.generate_batch(["vary"], [5], steps=[k])[0]
                for k in set(caps)}

    def _drive(self, caps, **kw):
        pipe2, tokenize2 = _toy_pipeline()
        eng = ContinuousBatchingEngine(pipe2, tokenize2, seg_steps=2,
                                       max_steps=6, **kw)
        eng.start()
        try:
            reqs = [(k, eng.submit("vary", seed=5, steps=k)) for k in caps]
            return [(k, r.result(timeout=600)) for k, r in reqs]
        finally:
            eng.stop()

    def _check(self, got_list, want):
        for k, got in got_list:
            exp = want[k]
            assert got["inference_steps"] == exp["inference_steps"]
            np.testing.assert_allclose(got["sigmas"], exp["sigmas"],
                                       rtol=1e-5, atol=1e-8)
            diff = np.abs(
                got["image"].astype(np.int64) - exp["image"].astype(np.int64)
            ).max()
            assert diff <= 1, f"cap {k}: image off by {diff} > 1 LSB"

    def test_dp_slots_match_single_device(self, toy):
        caps = [1, 3, 6, 2, 5]  # 5 requests churning 2 dp-sharded slots
        want = self._reference(toy, caps)
        self._check(self._drive(caps, dp=2, slots=2), want)

    def test_full_mesh_sharded_model(self, toy):
        # (2,2,2): sharded backbone incl. tensor axis, slots over
        # (data, fsdp) = 4 shards x 2 slots each — per-shard batch >= 2
        # is REQUIRED to expose row-mixing partitioner bugs (CLAUDE.md
        # landmine; see test_parallel.py sharded-forward test)
        caps = [1, 2, 3, 4, 5, 6, 2, 4, 6, 1]
        want = self._reference(toy, caps)
        self._check(
            self._drive(caps, mesh_shape=(2, 2, 2), slots=8), want
        )

    def test_fused_adapters_under_full_mesh(self, toy):
        """Fused multi-tenant LoRA on the (2,2,2) serving mesh: the factor
        bank replicates, slot ids route per-row deltas into batch-sharded
        activations (GSPMD). Mesh results must match the single-device
        FUSED engine (same math, differently partitioned program: 1-LSB
        seam), with per-shard batch >= 2 (partitioner-landmine rule)."""
        import jax

        def adapters(pipe):
            return {
                n: _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(s))
                for n, s in (("a", 1), ("b", 2))
            }

        jobs = [("vary", 5, 3, "a"), ("vary", 5, 3, "b"),
                ("vary", 5, 6, None), ("other", 2, 4, "a"),
                ("vary", 5, 2, "b"), ("other", 2, 6, None),
                ("vary", 5, 4, "a"), ("other", 2, 2, "b")]

        def drive(mesh_shape, slots):
            pipe, tokenize = _toy_pipeline()
            kw = {} if mesh_shape is None else {"mesh_shape": mesh_shape}
            eng = ContinuousBatchingEngine(pipe, tokenize, slots=slots,
                                           seg_steps=2, max_steps=6,
                                           fused_lora=True, **kw)
            for n, lora in adapters(pipe).items():
                eng.register_adapter(n, lora)
            eng.start()
            try:
                reqs = [eng.submit(p, seed=s, steps=c, lora=l)
                        for p, s, c, l in jobs]
                return [r.result(timeout=600) for r in reqs]
            finally:
                eng.stop()

        want = drive(None, 1)  # single-device fused, solo slots
        got = drive((2, 2, 2), 8)
        for j, w, g in zip(jobs, want, got):
            assert g["inference_steps"] == w["inference_steps"]
            diff = np.abs(
                g["image"].astype(np.int64) - w["image"].astype(np.int64)
            ).max()
            assert diff <= 1, f"{j}: image off by {diff} > 1 LSB"

    def test_bad_shapes_rejected(self, toy):
        pipe, tokenize = toy
        with pytest.raises(ValueError, match="divisible"):
            ContinuousBatchingEngine(pipe, tokenize, slots=3, dp=2)
        with pytest.raises(ValueError, match="not both"):
            ContinuousBatchingEngine(pipe, tokenize, slots=4, dp=2,
                                     mesh_shape=(2, 1, 1))


class TestLifecycle:
    def test_backpressure(self, toy):
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=1,
                                       queue_limit=1)
        eng.submit("first")  # worker not started; sits in the queue
        with pytest.raises(EngineOverloaded):
            eng.submit("second")

    def test_stop_fails_queued_and_inflight(self, toy):
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=1,
                                       max_steps=3)
        # queued-only: worker never started
        eng._thread = threading.Thread(target=lambda: None)
        eng._thread.start()
        req = eng.submit("orphan")
        eng.stop()
        with pytest.raises(RuntimeError, match="engine stopped"):
            req.result(timeout=5)
        with pytest.raises(EngineOverloaded):
            eng.submit("too late")

    def test_restart_serves_again(self, toy):
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=2,
                                       max_steps=3)
        eng.start()
        eng.stop()
        eng.stop()  # idempotent
        eng.start()
        try:
            assert eng.submit("hello").result(timeout=600)["inference_steps"] >= 1
        finally:
            eng.stop()

    def test_sync_decode_mode_matches(self, toy):
        """async_decode=False (strictly sequential loop) must produce the
        same results as the default decode-worker pipeline."""
        pipe, tokenize = toy
        kw = dict(slots=1, seg_steps=2, max_steps=3)
        res = {}
        for mode in (True, False):
            eng = ContinuousBatchingEngine(pipe, tokenize,
                                           async_decode=mode, **kw)
            eng.start()
            try:
                assert (eng._decode_thread is not None) == mode
                res[mode] = eng.submit("modes", seed=4).result(timeout=600)
            finally:
                eng.stop()
        assert res[True]["inference_steps"] == res[False]["inference_steps"]
        np.testing.assert_array_equal(res[True]["image"], res[False]["image"])

    def test_stop_completes_pending_decodes(self, toy):
        """A request whose denoise finished but whose decode is still queued
        at stop() time COMPLETES (stop drains the decode worker) instead of
        failing like undecoded in-flight work."""
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=2,
                                       max_steps=3)
        real = eng._decode_row
        eng._decode_row = lambda lat: (time.sleep(1.0), real(lat))[1]
        eng.start()
        try:
            req = eng.submit("slow decode", seed=6)
            # phase 1: the worker assigns the request to the slot
            for _ in range(2400):
                if eng._slot_req[0] is not None or req._event.is_set():
                    break
                time.sleep(0.05)
            # phase 2: denoise finishes — slot freed, decode in flight
            for _ in range(2400):
                if eng._slot_req[0] is None or req._event.is_set():
                    break
                time.sleep(0.05)
        finally:
            eng.stop()
        got = req.result(timeout=5)  # must not raise
        assert got["inference_steps"] >= 1
        assert eng.stats()["decode_pending"] == 0

    def test_segment_error_propagates_and_engine_recovers(self, toy):
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=1,
                                       max_steps=3)
        real = eng._segment
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected")
            return real(*a, **k)

        eng._segment = flaky
        eng.start()
        try:
            bad = eng.submit("boom", seed=1)
            with pytest.raises(RuntimeError, match="injected"):
                bad.result(timeout=600)
            ok = eng.submit("fine", seed=2)
            assert ok.result(timeout=600)["inference_steps"] >= 1
        finally:
            eng._segment = real
            eng.stop()


def _noisy_lora(params, key, rank=2, scale_b=0.05):
    """LoRA factors with RANDOM b (init_lora's b=0 is an exact identity —
    useless for telling adapters apart in tests)."""
    import jax

    from tpdm_tpu.models.lora import init_lora

    lora = init_lora(params, rank=rank, key=key)
    out = {}
    for i, (name, fac) in enumerate(sorted(lora.items())):
        kb = jax.random.fold_in(key, i + 1)
        out[name] = {
            "a": fac["a"],
            "b": jax.random.normal(kb, fac["b"].shape, fac["b"].dtype)
            * scale_b,
        }
    return out


class TestContinuousAdapters:
    """Multi-tenant LoRA over continuous batching: slots carry different
    adapters, segments time-multiplex one adapter's merged params with the
    live-mask freezing its peers — a request's trajectory must equal a
    solo run under its merged weights regardless of slot neighbours."""

    def test_mixed_pool_parity_with_fixed_engine(self, toy):
        import jax

        pipe, tokenize = toy
        lora_a = _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(1))
        lora_b = _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(2))

        ref = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=4)
        ref.register_adapter("a", lora_a, merged_cache=2)
        ref.register_adapter("b", lora_b, merged_cache=2)
        jobs = [("a cat", 7, None), ("a cat", 7, "a"), ("a cat", 7, "b"),
                ("blue bird", 3, "a")]
        want = {
            (p, s, l): ref.generate_batch([p], [s], lora=l)[0]["image"]
            for p, s, l in jobs
        }
        assert (
            np.abs(want[jobs[0]].astype(int) - want[jobs[1]].astype(int)).max()
            > 1
        ), "adapter must visibly change the output"

        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=4)
        eng.register_adapter("a", lora_a, merged_cache=2)
        eng.register_adapter("b", lora_b, merged_cache=2)
        eng.start()
        try:
            reqs = [(j, eng.submit(j[0], seed=j[1], lora=j[2]))
                    for j in jobs]
            for j, r in reqs:
                got = r.result(timeout=600)["image"]
                diff = np.abs(
                    got.astype(np.int16) - want[j].astype(np.int16)
                )
                # different jit programs (segment scan vs whole loop):
                # allow the documented 1-level uint8 seam, never more
                assert diff.max() <= 1, (j, diff.max())
            st = eng.stats()
            assert st["adapter_merges"] == 2  # one merge per adapter, LRU hit after
            assert set(st["adapter_segments"]) == {"a", "b"}
            # param-operand switching must not retrace the segment
            assert eng.segment_traces == 1
        finally:
            eng.stop()

    def test_fairness_base_not_starved_by_adapter_flood(self, toy):
        import jax

        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=1,
                                       max_steps=4)
        eng.register_adapter(
            "a", _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(1))
        )
        eng.adapter_fair_every = 2
        eng.start()
        try:
            flood = [eng.submit(f"p{i}", seed=i, lora="a") for i in range(6)]
            base = eng.submit("base prompt", seed=99)
            assert base.result(timeout=600)["inference_steps"] >= 1
            for r in flood:
                r.result(timeout=600)
        finally:
            eng.stop()

    def test_fused_mixed_pool_matches_merged_solo(self, toy):
        """fused_lora=True: per-slot rank-r deltas inside the backbone.
        Base requests keep base numerics (1-level seam: the interceptor
        graph fuses differently); adapter requests match the MERGED solo
        run within the rounding of W-vs-(W+Δ) in the base matmuls (the
        documented fused/merged numerics gap)."""
        import jax

        pipe, tokenize = toy
        lora_a = _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(1))
        lora_b = _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(2))
        ref = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=4)
        ref.register_adapter("a", lora_a, merged_cache=2)
        ref.register_adapter("b", lora_b, merged_cache=2)
        jobs = [("a cat", 7, None), ("a cat", 7, "a"), ("blue bird", 3, "b")]
        want = {
            j: ref.generate_batch([j[0]], [j[1]], lora=j[2])[0]["image"]
            for j in jobs
        }

        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=4, fused_lora=True)
        eng.register_adapter("a", lora_a)
        eng.register_adapter("b", lora_b)
        eng.start()
        try:
            reqs = [(j, eng.submit(j[0], seed=j[1], lora=j[2]))
                    for j in jobs]
            for j, r in reqs:
                got = r.result(timeout=600)["image"]
                diff = np.abs(
                    got.astype(np.int16) - want[j].astype(np.int16)
                )
                if j[2] is None:
                    # base rows ride an exact zero delta
                    assert diff.max() <= 1, diff.max()
                else:
                    # fused-vs-merged rounding, amplified through the
                    # adaptive loop: small but not bitwise
                    assert diff.max() <= 24, diff.max()
                    assert diff.mean() < 3.0, diff.mean()
                    # ... and the adapter must still dominate the delta:
                    base_diff = np.abs(
                        want[(j[0], j[1], None)].astype(np.int16)
                        - want[j].astype(np.int16)
                    ) if (j[0], j[1], None) in want else None
                    if base_diff is not None:
                        assert base_diff.max() > diff.max()
            st = eng.stats()
            assert st["lora_mode"] == "fused"
            assert st["adapter_merges"] == 0  # no merged trees in fused mode
        finally:
            eng.stop()

    def test_fused_advances_all_tenants_in_one_segment(self, toy):
        """The fused mode's point: a 50/50 two-tenant pool finishes in the
        segments a single-tenant pool would need (time-multiplexing would
        pay one segment per tenant)."""
        import jax

        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=3,
                                       max_steps=3, fused_lora=True)
        eng.register_adapter(
            "a", _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(1))
        )
        eng.register_adapter(
            "b", _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(2))
        )
        ra = eng.submit("x", seed=1, lora="a")
        rb = eng.submit("y", seed=2, lora="b")
        eng.start()
        try:
            ra.result(timeout=600)
            rb.result(timeout=600)
            st = eng.stats()
            assert st["segments_run"] == 1, st["segments_run"]
            assert st["slot_utilization"] == 1.0
        finally:
            eng.stop()

    def test_fused_rejected_on_family_engines(self, toy):
        with pytest.raises(ValueError, match="SD3"):
            ContinuousBatchingEngine(None, None, slots=1, fused_lora=True)


class TestQuantFusedAdapters:
    """QLoRA-style serving: stored-int8/int4 backbone + fused rank-r
    adapters. The interceptor adds x@A@B NEXT TO the quantized matmul
    (models/lora.py lora_interceptor targets DenseMaybeQuant too), so no
    float merge is needed; multiplex mode — which materializes
    apply_lora(base, factors) — is refused on quantized trees."""

    @staticmethod
    def _quant_pipe(flag):
        import argparse

        import serve

        args = argparse.Namespace(
            toy=True, cpu=True, pretrained=None, tpm=None, **{flag: True}
        )
        return serve.build_pipeline(args)

    def test_fused_adapters_over_int8_backbone(self):
        import jax
        import jax.numpy as jnp

        pipe, tokenize = self._quant_pipe("int8")
        blk = pipe.mmdit_params["params"]["transformer_blocks_0"]
        assert blk["attn"]["to_q"]["kernel"].dtype == jnp.int8
        lora = _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(1))

        ref = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=4)
        want_base = ref.generate_batch(["a cat"], [7])[0]["image"]

        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=4, fused_lora=True)
        eng.register_adapter("style", lora)
        eng.start()
        try:
            rb = eng.submit("a cat", seed=7)
            rt = eng.submit("a cat", seed=7, lora="style")
            base = rb.result(timeout=600)["image"]
            tuned = rt.result(timeout=600)["image"]
        finally:
            eng.stop()
        # base slots ride an exact zero delta; int8 cross-program seams
        # are wider than fp's (a shifted dynamic-range max requantizes a
        # whole activation row) — same budget as the int8 mesh test
        base_diff = np.abs(base.astype(np.int16) - want_base.astype(np.int16))
        assert base_diff.max() <= 3, base_diff.max()
        # the adapter must dominate any seam
        tuned_diff = np.abs(tuned.astype(np.int16) - base.astype(np.int16))
        assert tuned_diff.max() > 3, tuned_diff.max()
        st = eng.stats()
        assert st["lora_mode"] == "fused"
        assert st["adapter_merges"] == 0  # no merged trees exist here

    @pytest.mark.parametrize("flag", ["int8", "int4"])
    def test_multiplex_adapters_rejected_on_quant_backbone(self, flag):
        import jax

        pipe, tokenize = self._quant_pipe(flag)
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=1,
                                       max_steps=2)
        with pytest.raises(ValueError, match="fused-only"):
            eng.register_adapter(
                "a", _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(1))
            )

    def test_adapter_validation(self, toy):
        import jax

        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=1,
                                       max_steps=2)
        with pytest.raises(ValueError, match="unknown adapter"):
            eng.submit("x", lora="nope")
        with pytest.raises(ValueError, match="non-empty"):
            eng.register_adapter(
                "", _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(1))
            )
        eng.start()
        try:
            with pytest.raises(RuntimeError, match="before start"):
                eng.register_adapter(
                    "late", _noisy_lora(pipe.mmdit_params,
                                        jax.random.PRNGKey(1))
                )
        finally:
            eng.stop()


class TestMultiResRouter:
    """Per-request resolution over continuous batching: one engine (slot
    pool + compiled segment) per resolution, shared weights."""

    def test_routes_and_matches_fixed_batch_per_resolution(self, toy):
        from tpdm_tpu.serving_continuous import MultiResContinuousRouter

        pipe, tokenize = toy
        ref = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=6, vae_scale_factor=2,
                             resolutions=[24])
        router = MultiResContinuousRouter(
            pipe, tokenize, resolutions=[24], slots=2, seg_steps=2,
            max_steps=6, vae_scale_factor=2,
        )
        assert router.resolutions == [16, 24]
        router.start()
        try:
            reqs = [
                (None, router.submit("a cat", seed=3)),
                (24, router.submit("a cat", seed=3, resolution=24)),
                (16, router.submit("blue bird", seed=7, resolution=16)),
            ]
            for res, r in reqs:
                got = r.result(timeout=600)
                px = res or 16
                assert got["image"].shape == (px, px, 3)
                exp = ref.generate_batch(
                    [r.prompt], [r.seed], resolution=res
                )[0]
                assert got["inference_steps"] == exp["inference_steps"]
                # router (slot pool, seg-step jit) and fixed-batch engine
                # compile DIFFERENT programs; XLA fusion may round bf16
                # 1 ulp apart, which lands exactly on a uint8 quantization
                # boundary for the odd pixel — allow the seam (same bound
                # as the int8 mesh-serving seam tests), never more
                diff = np.abs(
                    got["image"].astype(np.int16)
                    - exp["image"].astype(np.int16)
                )
                assert diff.max() <= 1, diff.max()
                assert (diff > 0).mean() < 0.01
            s = router.stats()
            assert s["requests_done"] == 3
            assert s["resolutions"]["16"]["requests_done"] == 2
            assert s["resolutions"]["24"]["requests_done"] == 1
        finally:
            router.stop()

    def test_router_forwards_per_request_cfg_knobs(self, toy):
        """guidance_scale / negative_prompt pass through the router to the
        resolution engine: a non-default strength == a fixed-batch run at
        that engine-level strength (1-level seam across programs)."""
        from tpdm_tpu.serving_continuous import MultiResContinuousRouter

        pipe, tokenize = toy
        exp = BatchingEngine(
            pipe, tokenize, max_batch=1, window_ms=1, max_steps=4,
            guidance_scale=2.0, vae_scale_factor=2,
        ).generate_batch(["a cat"], [3])[0]
        router = MultiResContinuousRouter(
            pipe, tokenize, resolutions=[], slots=1, seg_steps=2,
            max_steps=4, guidance_scale=7.0, vae_scale_factor=2,
        )
        router.start()
        try:
            got = router.submit(
                "a cat", seed=3, guidance_scale=2.0
            ).result(timeout=600)
            diff = np.abs(
                got["image"].astype(np.int16) - exp["image"].astype(np.int16)
            )
            assert diff.max() <= 1, diff.max()
            # negative prompt reaches the slot state: output changes
            neg = router.submit(
                "a cat", seed=3, guidance_scale=2.0,
                negative_prompt="blurry",
            ).result(timeout=600)
            assert np.abs(
                neg["image"].astype(np.int16) - got["image"].astype(np.int16)
            ).max() > 1
        finally:
            router.stop()

    def test_unknown_resolution_rejected(self, toy):
        from tpdm_tpu.serving_continuous import MultiResContinuousRouter

        pipe, tokenize = toy
        router = MultiResContinuousRouter(
            pipe, tokenize, resolutions=[24], slots=1, seg_steps=1,
            max_steps=2, vae_scale_factor=2,
        )
        with pytest.raises(ValueError, match="served set"):
            router.submit("x", resolution=32)

    def test_http_server_with_resolutions_builds_router(self, toy):
        import serve
        from tpdm_tpu.serving_continuous import MultiResContinuousRouter

        pipe, tokenize = toy
        args = argparse.Namespace(
            max_steps=3, max_batch=1, batch_window_ms=10.0, dp=None,
            mesh=None, continuous=True, seg_steps=1, resolutions="24",
            prompt="d", seed=1, port=0,
        )
        engine, server = serve.make_http_server(pipe, tokenize, args)
        engine.start()
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            import http.client
            import json as _json

            assert isinstance(engine, MultiResContinuousRouter)
            port = server.server_address[1]
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request(
                "POST", "/generate",
                body=_json.dumps(
                    {"prompt": "a cat", "seed": 7, "resolution": 24}
                ),
            )
            resp = conn.getresponse()
            assert resp.status == 200
            assert 1 <= _json.loads(resp.read())["inference_steps"] <= 3
        finally:
            server.shutdown()
            engine.stop()


class TestServeIntegration:
    def test_http_server_with_continuous_flag(self, toy):
        import base64
        import http.client
        import json

        import serve

        pipe, tokenize = toy
        args = argparse.Namespace(
            max_steps=3, max_batch=2, batch_window_ms=10.0, dp=None,
            mesh=None, continuous=True, seg_steps=1,
            prompt="default", seed=1, port=0,
        )
        engine, server = serve.make_http_server(pipe, tokenize, args)
        assert isinstance(engine, ContinuousBatchingEngine)
        engine.start()
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            port = server.server_address[1]
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request(
                "POST", "/generate",
                body=json.dumps({"prompt": "a cat", "seed": 7}),
            )
            resp = conn.getresponse()
            assert resp.status == 200
            payload = json.loads(resp.read())
            assert 1 <= payload["inference_steps"] <= 3
            png = base64.b64decode(payload["image_png_base64"])
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            conn.request("GET", "/stats")
            stats = json.loads(conn.getresponse().read())
            assert stats["requests_done"] == 1
        finally:
            server.shutdown()
            engine.stop()

    def test_continuous_with_dp_builds_mesh_engine(self):
        """--continuous --dp N is supported: the engine shards its slot
        axis over a data mesh (fresh pipeline — placement commits params
        to the mesh in place)."""
        import serve

        pipe, tokenize = _toy_pipeline()
        args = argparse.Namespace(
            max_steps=3, max_batch=2, batch_window_ms=10.0, dp=2,
            mesh=None, continuous=True, seg_steps=1,
            prompt="d", seed=1, port=0,
        )
        engine, server = serve.make_http_server(pipe, tokenize, args)
        try:
            assert isinstance(engine, ContinuousBatchingEngine)
            assert engine._mesh is not None
            assert engine._mesh.shape["data"] == 2
        finally:
            server.server_close()
            engine.stop()


class TestCombinationGuards:
    def test_family_plus_resolutions_rejected(self, toy):
        """--resolutions is SD3-only: family agents compile one latent
        geometry; the combination must fail loudly, not serve ignored."""
        import serve

        args = argparse.Namespace(
            max_steps=3, max_batch=1, batch_window_ms=10.0, dp=None,
            mesh=None, continuous=True, seg_steps=1, resolutions="24",
        )
        with pytest.raises(SystemExit, match="SD3-only"):
            serve.make_http_server(
                None, None, args, runner=lambda *a: None,
                family_world={"family": "sd15"},
            )

    def test_int8_pipe_serves_continuous(self):
        """serve.py --int8 --continuous: a prequantized SD3 backbone runs
        through the continuous engine's compiled segment."""
        import serve

        args = argparse.Namespace(
            toy=True, cpu=True, pretrained=None, tpm=None, int8=True
        )
        pipe, tokenize = serve.build_pipeline(args)
        import jax.numpy as jnp

        blk = pipe.mmdit_params["params"]["transformer_blocks_0"]
        assert blk["attn"]["to_q"]["kernel"].dtype == jnp.int8
        eng = ContinuousBatchingEngine(
            pipe, tokenize, slots=1, seg_steps=2, max_steps=4
        )
        eng.start()
        try:
            r = eng.submit("a cat", seed=3).result(timeout=600)
            assert r["image"].shape == (16, 16, 3)
            assert 1 <= r["inference_steps"] <= 4
        finally:
            eng.stop()


class TestSharedEmbedCache:
    def test_router_shares_one_cache_across_resolutions(self, toy):
        """A prompt served at N resolutions pays ONE cold text-encode:
        the router hands every per-resolution engine the same
        PromptEmbedCache (embeds depend only on the prompt)."""
        from tpdm_tpu.serving_continuous import MultiResContinuousRouter

        pipe, tokenize = toy
        calls = []

        def counting_tokenize(prompt, n=8):
            calls.append(prompt)
            return tokenize(prompt, n)

        router = MultiResContinuousRouter(
            pipe, counting_tokenize, resolutions=[24], slots=1, seg_steps=2,
            max_steps=4, vae_scale_factor=2,
        )
        router.start()
        try:
            n_probe = len(calls)  # engine-build probe encodes
            a = router.submit("a cat", seed=3).result(timeout=600)
            b = router.submit("a cat", seed=3, resolution=24).result(timeout=600)
            assert a["image"].shape == (16, 16, 3)
            assert b["image"].shape == (24, 24, 3)
            assert len(calls) - n_probe == 1, calls[n_probe:]
        finally:
            router.stop()

    def test_prompt_embed_cache_lru_and_len(self):
        from tpdm_tpu.serving_continuous import PromptEmbedCache

        c = PromptEmbedCache(size=2)
        c.put("a", 1)
        c.put("b", 2)
        assert c.get("a") == 1  # bumps a
        c.put("c", 3)  # evicts b (LRU)
        assert c.get("b") is None
        assert c.get("a") == 1 and c.get("c") == 3
        assert len(c) == 2


class TestResolutionValidation:
    def test_unpatchable_resolution_rejected_at_build(self, toy):
        """A resolution whose latent grid doesn't patchify must fail at
        construction, not as a shape error inside the worker thread."""
        pipe, tokenize = toy  # toy: vae_scale_factor 2, patch_size 2
        with pytest.raises(ValueError, match="patch_size"):
            ContinuousBatchingEngine(
                pipe, tokenize, slots=1, seg_steps=1, max_steps=2,
                resolution=18, vae_scale_factor=2,
            )


class TestDeadlinesContinuous:
    def test_expired_request_never_takes_a_slot(self, toy):
        from tpdm_tpu.serving import RequestExpired

        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=2,
                                       max_steps=4)
        stale = eng.submit("a cat", seed=1, deadline_s=0.01)
        time.sleep(0.05)
        live = eng.submit("blue bird", seed=2)
        eng.start()
        try:
            out = live.result(timeout=600)
            assert 1 <= out["inference_steps"] <= 4
            with pytest.raises(RequestExpired, match="waited"):
                stale.result(timeout=10)
            assert eng.stats()["requests_expired"] == 1
        finally:
            eng.stop()


class TestContinuousPerRequestCFG:
    """Per-slot guidance strength + negative-prompt embeds are traced
    state: any mix shares the compiled segment and matches the
    fixed-batch engine."""

    def test_parity_with_fixed_batch_engine(self, toy):
        pipe, tokenize = toy
        ref_eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                 max_steps=4)
        want_g = ref_eng.generate_batch(
            ["a cat"], [3], guidances=[2.0]
        )[0]
        want_n = ref_eng.generate_batch(
            ["a dog"], [7], negative_prompts=["blurry"]
        )[0]
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=4)
        eng.start()
        try:
            r_g = eng.submit("a cat", seed=3, guidance_scale=2.0)
            r_n = eng.submit("a dog", seed=7, negative_prompt="blurry")
            got_g = r_g.result(timeout=600)
            got_n = r_n.result(timeout=600)
        finally:
            eng.stop()
        for got, want in ((got_g, want_g), (got_n, want_n)):
            assert got["inference_steps"] == want["inference_steps"]
            # differently-compiled programs: allow the 1-level seam
            assert (
                np.abs(
                    got["image"].astype(np.int16)
                    - want["image"].astype(np.int16)
                ).max()
                <= 1
            )

    def test_default_slots_unperturbed_and_validation(self, toy):
        pipe, tokenize = toy
        solo = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=2,
                                        max_steps=4)
        solo.start()
        try:
            want = solo.submit("a cat", seed=3).result(timeout=600)
        finally:
            solo.stop()
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=4)
        eng.start()
        try:
            r_def = eng.submit("a cat", seed=3)
            r_g = eng.submit("a dog", seed=5, guidance_scale=1.0,
                             negative_prompt="red")
            got = r_def.result(timeout=600)
            other = r_g.result(timeout=600)
        finally:
            eng.stop()
        # a default-CFG slot next to a custom-CFG slot is bit-identical
        # to running alone
        np.testing.assert_array_equal(got["image"], want["image"])
        assert got["inference_steps"] == want["inference_steps"]
        assert 1 <= other["inference_steps"] <= 4
        no_cfg = ContinuousBatchingEngine(pipe, tokenize, slots=1,
                                          seg_steps=2, max_steps=3,
                                          guidance_scale=None)
        try:
            with pytest.raises(ValueError, match="CFG-enabled"):
                no_cfg.submit("a", guidance_scale=2.0)
        finally:
            no_cfg.stop()


class TestContinuousImg2Img:
    """img2img slots in the continuous engine: per-slot starting sigma is
    traced state, so i2i and t2i requests share the compiled segment AND
    match the fixed-batch engine bit-for-bit (same noise mixing)."""

    def _img(self, pipe, seed=0):
        px = pipe.mmdit.config.sample_size * 2  # toy VAE factor 2
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (px, px, 3), dtype=np.uint8)

    def test_parity_with_fixed_batch_engine(self, toy):
        pipe, tokenize = toy
        img = self._img(pipe, seed=8)
        ref = BatchingEngine(
            pipe, tokenize, max_batch=1, window_ms=1, max_steps=4,
            vae_scale_factor=2,
        ).generate_batch(
            ["a boat"], [11], init_images=[img], strengths=[0.5]
        )[0]
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=4, vae_scale_factor=2)
        eng.start()
        try:
            got = eng.submit(
                "a boat", seed=11, init_image=img, strength=0.5
            ).result(timeout=600)
        finally:
            eng.stop()
        assert got["inference_steps"] == ref["inference_steps"]
        # two differently-compiled programs: allow the rare 1-level seam
        assert (
            np.abs(
                got["image"].astype(np.int16) - ref["image"].astype(np.int16)
            ).max()
            <= 1
        )

    def test_mixed_slots_t2i_unperturbed(self, toy):
        pipe, tokenize = toy
        img = self._img(pipe, seed=9)
        solo = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=2,
                                        max_steps=4, vae_scale_factor=2)
        solo.start()
        try:
            want = solo.submit("a cat", seed=3).result(timeout=600)
        finally:
            solo.stop()
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=4, vae_scale_factor=2)
        eng.start()
        try:
            r_t2i = eng.submit("a cat", seed=3)
            r_i2i = eng.submit("a dog", seed=5, init_image=img, strength=0.3)
            got = r_t2i.result(timeout=600)
            out_i2i = r_i2i.result(timeout=600)
        finally:
            eng.stop()
        np.testing.assert_array_equal(got["image"], want["image"])
        assert got["inference_steps"] == want["inference_steps"]
        assert 1 <= out_i2i["inference_steps"] <= 4
        # a strength-0.3 slot starts at sigma 0.3
        assert out_i2i["sigmas"][0] <= 0.3 + 1e-6

    def test_validation(self, toy):
        pipe, tokenize = toy
        img = self._img(pipe)
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=1,
                                       max_steps=2, vae_scale_factor=2)
        with pytest.raises(ValueError, match="strength"):
            eng.submit("x", init_image=img, strength=0.0)
        with pytest.raises(ValueError, match="serves"):
            eng.submit("x", init_image=img[:-2])
        with pytest.raises(ValueError, match="init_image"):
            eng.submit("x", strength=0.4)


class TestContinuousAB2:
    """solver='ab2' on the continuous engine: per-segment second-order
    integration (v_prev/sigma_prev ride the segment scan and reset at
    boundaries, like the per-segment Δ-cache)."""

    def test_single_segment_matches_fixed_batch_ab2(self, toy):
        """With seg_steps >= the step cap the whole request runs in ONE
        segment — no AB2 reset ever happens, so the trajectory must match
        the fixed-batch engine's ab2 path (same 1-ulp cross-program seam
        as the euler parity test)."""
        pipe, tokenize = toy
        ref = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=6, solver="ab2")
        exp = ref.generate_batch(["a cat"], [3])[0]
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=1, seg_steps=8,
                                       max_steps=6, solver="ab2")
        eng.start()
        try:
            got = eng.submit("a cat", seed=3).result(timeout=600)
        finally:
            eng.stop()
        assert got["inference_steps"] == exp["inference_steps"]
        diff = np.abs(got["image"].astype(np.int16)
                      - exp["image"].astype(np.int16))
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.01
        np.testing.assert_allclose(
            got["sigmas"], exp["sigmas"], rtol=1e-5, atol=1e-8
        )

    def test_multi_segment_ab2_deterministic_and_recycles(self, toy):
        pipe, tokenize = toy
        eng = ContinuousBatchingEngine(pipe, tokenize, slots=2, seg_steps=2,
                                       max_steps=6, solver="ab2")
        eng.start()
        try:
            a = [eng.submit(p, seed=s) for p, s in
                 [("a cat", 3), ("a dog", 7), ("bird", 11)]]
            out1 = [r.result(timeout=600) for r in a]
            b = [eng.submit(p, seed=s) for p, s in
                 [("a cat", 3), ("a dog", 7), ("bird", 11)]]
            out2 = [r.result(timeout=600) for r in b]
        finally:
            eng.stop()
        for x, y in zip(out1, out2):
            np.testing.assert_array_equal(x["image"], y["image"])
            assert 1 <= x["inference_steps"] <= 6

    def test_rejections(self, toy):
        pipe, tokenize = toy
        with pytest.raises(ValueError, match="euler.*ab2|ab2"):
            ContinuousBatchingEngine(pipe, tokenize, solver="heun")
        with pytest.raises(ValueError, match="mutually exclusive"):
            ContinuousBatchingEngine(pipe, tokenize, solver="ab2",
                                     cache_interval=2)
