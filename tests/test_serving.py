"""Serving engine: request coalescing, fixed-shape padding, DP replicas.

The reference's serving story is a single-request gradio callback
(reference: gradio_sd3_inference.py:18-84); tpdm_tpu/serving.py adds the
production pieces a TPU deployment needs — one compiled batch shape under
any traffic, and data-parallel batch sharding over a device mesh.
"""

import argparse
import threading

import numpy as np
import pytest

from tpdm_tpu.serving import BatchingEngine


def _toy_pipeline():
    import serve

    args = argparse.Namespace(toy=True, cpu=True, pretrained=None, tpm=None)
    return serve.build_pipeline(args)


@pytest.fixture(scope="module")
def toy():
    pipe, tokenize = _toy_pipeline()
    return pipe, tokenize


class TestBatchingEngine:
    def test_concurrent_requests_coalesce_into_one_batch(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=3, window_ms=200,
                             max_steps=4)
        eng.start()
        try:
            reqs = [eng.submit(f"prompt {i}", seed=i) for i in range(3)]
            results = [r.result(timeout=300) for r in reqs]
        finally:
            eng.stop()
        assert eng.batches_run == 1
        for res in results:
            assert res["image"].shape[-1] == 3
            assert 1 <= res["inference_steps"] <= 4
            assert np.isfinite(res["image"]).all() or res["image"].dtype == np.uint8

    def test_partial_batch_pads_to_compiled_shape(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=3, window_ms=1,
                             max_steps=4)
        n_sigs = len(pipe._jit_cache)
        out3 = eng.generate_batch(["a", "b", "c"], [1, 2, 3])
        sigs_after_full = len(pipe._jit_cache)
        out1 = eng.generate_batch(["a"], [1])
        # padding keeps the jitted signature count flat: no recompile for
        # partial batches
        assert len(pipe._jit_cache) == sigs_after_full
        assert sigs_after_full <= n_sigs + 1
        assert len(out3) == 3 and len(out1) == 1

    def test_same_seed_same_image_across_batch_compositions(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                             max_steps=4)
        solo = eng.generate_batch(["a cat"], [7])[0]
        paired = eng.generate_batch(["a dog", "a cat"], [3, 7])[1]
        np.testing.assert_array_equal(solo["image"], paired["image"])
        assert solo["inference_steps"] == paired["inference_steps"]

    def test_stats_report_stage_latencies(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                             max_steps=4)
        assert eng.stats() == {"batches_run": 0}
        eng.generate_batch(["a"], [0])
        eng.generate_batch(["b", "c"], [1, 2])
        s = eng.stats()
        assert s["batches_run"] == 2 and s["recent"] == 2
        assert 0 < s["device_s_p50"] <= s["device_s_p95"]
        assert 0.25 <= s["batch_fill_mean"] <= 1.0  # (1/2 + 2/2) / 2

    def test_http_seed_parity_with_direct_generate(self, toy):
        # same (prompt, seed) must give the SAME image through the engine
        # (HTTP path) and pipe.generate (cli/gradio path)
        import serve

        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=4)
        via_engine = eng.generate_batch(["a cat"], [11])[0]["image"]
        via_pipe = serve.generate(pipe, tokenize, "a cat", 11, 4).images[0]
        np.testing.assert_array_equal(via_engine, via_pipe)

    def test_queue_limit_backpressure(self, toy):
        from tpdm_tpu.serving import EngineOverloaded

        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=1, queue_limit=1)
        eng.submit("first")  # worker not started; sits in the queue
        with pytest.raises(EngineOverloaded):
            eng.submit("second")

    def test_error_propagates_to_all_waiters(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=100,
                             max_steps=4)

        def boom(*a, **k):
            raise RuntimeError("injected")

        eng.generate_batch = boom
        eng.start()
        try:
            reqs = [eng.submit("x"), eng.submit("y")]
            for r in reqs:
                with pytest.raises(RuntimeError, match="injected"):
                    r.result(timeout=60)
        finally:
            eng.stop()

    def test_stop_fails_pending_requests_instead_of_hanging(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=2)
        # never start the worker: the queued request must be failed by stop()
        eng._thread = threading.Thread(target=lambda: None)
        eng._thread.start()
        req = eng.submit("orphan")
        eng.stop()
        with pytest.raises(RuntimeError, match="engine stopped"):
            req.result(timeout=5)

    def test_stop_is_idempotent_and_restartable(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=2)
        eng.start()
        eng.stop()
        eng.stop()
        eng.start()
        try:
            assert eng.submit("hello").result(timeout=300)["inference_steps"] >= 1
        finally:
            eng.stop()


class TestHTTPServer:
    def test_generate_and_stats_over_http(self, toy):
        import base64
        import http.client
        import io
        import json

        import serve

        pipe, tokenize = toy
        args = argparse.Namespace(
            max_steps=3, max_batch=2, batch_window_ms=10.0, dp=None,
            prompt="default", seed=1, port=0,
        )
        engine, server = serve.make_http_server(pipe, tokenize, args)
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
            assert stats["batches_run"] == 1
            conn.request("GET", "/healthz")
            hz = conn.getresponse()
            assert hz.status == 200 and hz.read() == b"ok\n"
            conn.request("GET", "/metrics")
            mx = conn.getresponse()
            assert mx.status == 200
            text = mx.read().decode()
            assert "tpdm_batches_run 1" in text
            assert "# TYPE tpdm_batches_run gauge" in text
            conn.request("GET", "/nope")
            assert conn.getresponse().status == 404

            # malformed body -> 400, not a dropped socket / poisoned batch
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", "/generate", body=b"not json")
            assert conn.getresponse().status == 400
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", "/generate",
                         body=json.dumps({"prompt": 42}))
            assert conn.getresponse().status == 400

            # per-request response format: JPEG trades lossless for an
            # ~18x cheaper encode; bad formats 400
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request(
                "POST", "/generate",
                body=json.dumps(
                    {"prompt": "a cat", "seed": 7, "format": "jpeg"}
                ),
            )
            resp = conn.getresponse()
            assert resp.status == 200
            jp = json.loads(resp.read())
            raw = base64.b64decode(jp["image_jpeg_base64"])
            assert raw[:3] == b"\xff\xd8\xff"
            assert "image_png_base64" not in jp
            conn.request(
                "POST", "/generate",
                body=json.dumps({"prompt": "a cat", "format": "webp"}),
            )
            assert conn.getresponse().status == 400
        finally:
            server.shutdown()
            engine.stop()


class TestImg2ImgServing:
    """img2img and text-to-image requests mix in ONE fixed-shape batch:
    t2i slots ride sigma 1.0 with x0=0 (identical math to pure noise)."""

    def _img(self, pipe, seed=0):
        px = pipe.mmdit.config.sample_size * 2  # toy VAE factor 2
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (px, px, 3), dtype=np.uint8)

    def test_mixed_batch_t2i_slot_matches_pure_t2i(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                             max_steps=4, vae_scale_factor=2)
        img = self._img(pipe)
        pure = eng.generate_batch(["a cat", "pad"], [7, 1])[0]
        mixed = eng.generate_batch(
            ["a cat", "a dog"], [7, 3],
            init_images=[None, img], strengths=[None, 0.4],
        )
        # the t2i slot is numerically the same request (different jit
        # program: allow the rare 1-level uint8 rounding seam)
        assert (
            np.abs(
                pure["image"].astype(np.int16)
                - mixed[0]["image"].astype(np.int16)
            ).max()
            <= 1
        )
        assert pure["inference_steps"] == mixed[0]["inference_steps"]

    def test_engine_i2i_matches_pipeline_i2i(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                             max_steps=4, vae_scale_factor=2)
        img = self._img(pipe, seed=4)
        got = eng.generate_batch(
            ["a boat"], [11], init_images=[img], strengths=[0.5],
        )[0]
        clip_ids, t5_ids = tokenize("a boat")
        ref = pipe.generate(
            clip_ids=clip_ids,
            t5_ids=t5_ids,
            negative_clip_ids=np.zeros_like(clip_ids),
            negative_t5_ids=np.zeros_like(t5_ids),
            init_image=img[None],
            strength=0.5,
            seed=11,
            max_inference_steps=4,
            guidance_scale=eng.guidance_scale,
        )
        assert (
            np.abs(
                got["image"].astype(np.int16)
                - ref.images[0].astype(np.int16)
            ).max()
            <= 1
        )

    def test_submit_validation(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                             max_steps=4, vae_scale_factor=2)
        img = self._img(pipe)
        with pytest.raises(ValueError, match="strength"):
            eng.submit("x", init_image=img, strength=1.5)
        with pytest.raises(ValueError, match="serves"):
            eng.submit("x", init_image=img[:-2])
        with pytest.raises(ValueError, match="init_image"):
            eng.submit("x", strength=0.5)

    def test_submit_roundtrip(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=50,
                             max_steps=4, vae_scale_factor=2)
        eng.start()
        try:
            img = self._img(pipe, seed=9)
            r1 = eng.submit("a cat", seed=1)
            r2 = eng.submit("a dog", seed=2, init_image=img, strength=0.3)
            out1 = r1.result(timeout=300)
            out2 = r2.result(timeout=300)
        finally:
            eng.stop()
        assert out1["image"].dtype == np.uint8
        assert out2["image"].dtype == np.uint8
        assert 1 <= out2["inference_steps"] <= 4


class TestPrometheusExport:
    def test_renders_scalars_labels_and_skips_junk(self):
        from tpdm_tpu.utils.metrics_export import prometheus_text

        text = prometheus_text(
            {
                "batches_run": 3,
                "batch_fill_mean": 0.75,
                "flag": True,
                "adapter_batches": {"style-a": 2, 'we"ird': 1},
                "note": "a string",  # skipped
                "rows": [1, 2, 3],  # skipped
                "p95 latency (s)": 1.5,  # sanitized name
            }
        )
        assert "tpdm_batches_run 3\n" in text
        assert "tpdm_batch_fill_mean 0.75" in text
        assert "tpdm_flag 1" in text
        assert 'tpdm_adapter_batches{item="style-a"} 2' in text
        assert 'tpdm_adapter_batches{item="we\\"ird"} 1' in text
        assert "tpdm_p95_latency__s_ 1.5" in text
        assert "note" not in text and "rows" not in text
        # every sample line's metric has a TYPE header
        assert text.count("# TYPE tpdm_adapter_batches gauge") == 1

    def test_nonfinite_values(self):
        from tpdm_tpu.utils.metrics_export import prometheus_text

        text = prometheus_text({"a": float("nan"), "b": float("inf")})
        assert "tpdm_a NaN" in text
        assert "tpdm_b +Inf" in text


class TestDataParallelServing:
    def test_dp_requires_divisible_batch(self, toy):
        pipe, tokenize = toy
        with pytest.raises(ValueError, match="divisible"):
            BatchingEngine(pipe, tokenize, max_batch=3, dp=2)

    def test_dp_batch_matches_single_device(self):
        # fresh pipeline per engine: dp mutates param placement
        pipe1, tokenize = _toy_pipeline()
        base = BatchingEngine(pipe1, tokenize, max_batch=4, max_steps=4)
        want = base.generate_batch(["p0", "p1", "p2", "p3"], [0, 1, 2, 3])

        pipe2, tokenize2 = _toy_pipeline()
        eng = BatchingEngine(pipe2, tokenize2, max_batch=4, max_steps=4, dp=4)
        got = eng.generate_batch(["p0", "p1", "p2", "p3"], [0, 1, 2, 3])
        for a, b in zip(got, want):
            assert a["inference_steps"] == b["inference_steps"]
            # uint8 images; GSPMD may reorder reductions -> allow 1 LSB
            diff = np.abs(
                a["image"].astype(np.int32) - b["image"].astype(np.int32)
            )
            assert diff.max() <= 1, diff.max()


class TestObservabilityRoundout:
    """Round-2 VERDICT item 8 + ADVICE fixes."""

    def test_padded_slot_waste_counter(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=3, window_ms=1,
                             max_steps=4)
        eng.generate_batch(["a"], [0])          # 2 wasted slots
        eng.generate_batch(["a", "b", "c"], [0, 1, 2])  # 0 wasted
        s = eng.stats()
        assert s["padded_slots"] == 2
        assert abs(s["padded_slot_frac"] - 2 / 6) < 1e-9

    def test_split_stages_reports_decode_latency(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                             max_steps=4, split_stages=True)
        out = eng.generate_batch(["a", "b"], [0, 1])
        s = eng.stats()
        assert 0 < s["decode_s_p50"] <= s["decode_s_p95"]
        assert 0 < s["denoise_s_p50"]
        assert out[0]["image"].shape[-1] == 3  # still decoded images

    def test_split_stages_matches_fused_images(self, toy):
        pipe, tokenize = toy
        fused = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                               max_steps=4)
        split = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                               max_steps=4, split_stages=True)
        a = fused.generate_batch(["same prompt"], [11])[0]
        b = split.generate_batch(["same prompt"], [11])[0]
        np.testing.assert_array_equal(a["image"], b["image"])

    def test_submit_after_stop_raises(self, toy):
        from tpdm_tpu.serving import EngineOverloaded

        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=4)
        eng.start()
        eng.stop()
        with pytest.raises(EngineOverloaded, match="stopped"):
            eng.submit("too late")
        # restart clears the stop flag and serves again
        eng.start()
        try:
            assert eng.submit("ok", seed=0).result(timeout=300)
        finally:
            eng.stop()


class TestT5AddedTokenContiguity:
    def test_gap_in_added_ids_raises(self, tmp_path):
        import json

        from tpdm_tpu.utils.t5_tokenizer import T5Tokenizer

        spec = {
            "model": {
                "type": "Unigram",
                "unk_id": 2,
                "vocab": [["<pad>", 0.0], ["</s>", 0.0], ["<unk>", 0.0],
                          ["▁a", -2.0]],
            },
            "added_tokens": [
                {"id": 6, "content": "<extra>", "special": True},  # gap: 4,5
            ],
        }
        p = tmp_path / "tokenizer.json"
        p.write_text(json.dumps(spec), encoding="utf-8")
        with pytest.raises(ValueError, match="non-contiguous"):
            T5Tokenizer.from_tokenizer_json(str(p))


class TestMeshShardedServing:
    def test_mesh_serving_matches_single_device(self):
        """One model instance sharded over a (2,2,2) mesh serves the same
        images as an unsharded engine for the same (prompt, seed)s."""
        pipe1, tokenize1 = _toy_pipeline()
        plain = BatchingEngine(pipe1, tokenize1, max_batch=4, window_ms=1,
                               max_steps=4)
        ref = plain.generate_batch(["a", "b", "c", "d"], [1, 2, 3, 4])

        pipe2, tokenize2 = _toy_pipeline()
        eng = BatchingEngine(pipe2, tokenize2, max_batch=4, window_ms=1,
                             max_steps=4, mesh_shape=(2, 2, 2))
        out = eng.generate_batch(["a", "b", "c", "d"], [1, 2, 3, 4])
        for r, o in zip(ref, out):
            assert r["inference_steps"] == o["inference_steps"]
            # uint8 post-processing: allow off-by-one rounding at shard seams
            diff = np.abs(
                r["image"].astype(np.int32) - o["image"].astype(np.int32)
            )
            assert diff.max() <= 1, diff.max()

    def test_mesh_and_dp_mutually_exclusive(self, toy):
        pipe, tokenize = toy
        with pytest.raises(ValueError, match="not both"):
            BatchingEngine(pipe, tokenize, dp=2, mesh_shape=(2, 1, 1))

    def test_mesh_batch_divisibility(self, toy):
        pipe, tokenize = toy
        with pytest.raises(ValueError, match="divisible"):
            BatchingEngine(pipe, tokenize, max_batch=3, mesh_shape=(2, 2, 1))


class TestBestOfN:
    """Serving surface for the reference's list-ranking API
    (ImageReward.inference_rank, reference:
    src/reward_models/ImageReward/ImageReward.py:144-183): submit N seeds
    for one prompt, rank the candidates, return the best."""

    def test_generate_ranked_without_ranker(self, toy):
        from tpdm_tpu.serving import generate_ranked

        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=3, window_ms=50,
                             max_steps=4)
        eng.start()
        try:
            out = generate_ranked(eng, "a cat", seed=7, n=3)
        finally:
            eng.stop()
        assert out["seeds"] == [7, 8, 9]
        assert len(out["candidates"]) == 3
        assert "ranking" not in out and "best" not in out
        for c in out["candidates"]:
            assert c["image"].shape[-1] == 3

    def test_generate_ranked_with_image_reward_ranker(self, toy):
        from tpdm_tpu.rewards.image_reward import ImageRewardModel
        from tpdm_tpu.rewards.vit import ViTConfig
        from tpdm_tpu.rewards.bert import BertMedConfig
        from tpdm_tpu.serving import generate_ranked
        from tpdm_tpu.train.builders import build_inference_ranker

        class StubTok:
            # ids must stay inside the toy vocab (50): OOV ids raise in
            # ImageRewardModel._check_ids (NaN-embedding guard)
            def __call__(self, texts, max_length=35, **kw):
                ids = np.zeros((len(texts), max_length), np.int32)
                mask = np.zeros((len(texts), max_length), np.int32)
                for i, t in enumerate(texts):
                    toks = [2] + [hash(w) % 40 + 4 for w in t.split()][
                        : max_length - 2
                    ] + [3]
                    ids[i, : len(toks)] = toks
                    mask[i, : len(toks)] = 1
                return {"input_ids": ids, "attention_mask": mask}

        reward = ImageRewardModel.create(
            vit_config=ViTConfig.toy(), bert_config=BertMedConfig.toy()
        )
        ranker = build_inference_ranker(
            reward_model=reward, tokenizer=StubTok(), max_length=8
        )

        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=4, window_ms=50,
                             max_steps=4)
        eng.start()
        try:
            out = generate_ranked(eng, "a dog", seed=0, n=4, ranker=ranker)
        finally:
            eng.stop()
        assert sorted(out["ranking"]) == [1, 2, 3, 4]
        assert len(out["rewards"]) == 4
        assert np.isfinite(out["rewards"]).all()
        assert out["best"] == int(np.argmax(out["rewards"]))
        assert out["ranking"][out["best"]] == 1

    def test_generate_ranked_rejects_bad_n(self, toy):
        from tpdm_tpu.serving import generate_ranked

        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1)
        with pytest.raises(ValueError):
            generate_ranked(eng, "x", n=0)

    def test_rank_endpoint_over_http(self, toy):
        """POST /rank: best-of-N over HTTP. Without a reward checkpoint the
        endpoint still fans out seeds (ranked=false); bad n -> 400."""
        import base64
        import http.client
        import json

        import serve

        pipe, tokenize = toy
        args = argparse.Namespace(
            max_steps=3, max_batch=3, batch_window_ms=10.0, dp=None,
            prompt="default", seed=1, port=0, max_rank_n=4,
        )
        engine, server = serve.make_http_server(pipe, tokenize, args)
        engine.start()
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            port = server.server_address[1]
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request(
                "POST", "/rank",
                body=json.dumps({"prompt": "a cat", "seed": 5, "n": 3}),
            )
            resp = conn.getresponse()
            assert resp.status == 200
            payload = json.loads(resp.read())
            assert payload["seeds"] == [5, 6, 7]
            assert payload["ranked"] is False
            assert len(payload["images_png_base64"]) == 3
            for png64 in payload["images_png_base64"]:
                assert base64.b64decode(png64)[:8] == b"\x89PNG\r\n\x1a\n"
            assert all(1 <= s <= 3 for s in payload["inference_steps"])

            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", "/rank", body=json.dumps({"n": 99}))
            assert conn.getresponse().status == 400
        finally:
            server.shutdown()
            engine.stop()


class TestEmbedCache:
    """Per-prompt text-embedding LRU: repeated prompts (the /rank best-of-N
    pattern) skip the CLIP/T5 towers with bitwise-identical results."""

    def test_cached_batch_matches_encoded_batch(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                             max_steps=4)
        first = eng.generate_batch(["a cat", "a dog"], [1, 2])
        assert eng.embed_misses == 2 and eng.embed_hits == 0
        again = eng.generate_batch(["a cat", "a dog"], [1, 2])
        assert eng.embed_hits == 2
        for a, b in zip(first, again):
            np.testing.assert_array_equal(a["image"], b["image"])
        s = eng.stats()
        assert s["embed_cache_hits"] == 2 and s["embed_cache_misses"] == 2

    def test_cache_disabled(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                             max_steps=4, embed_cache=0)
        eng.generate_batch(["a cat"], [1])
        eng.generate_batch(["a cat"], [1])
        assert eng.embed_hits == 0 and eng.embed_misses == 0

    def test_lru_bound(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=4, embed_cache=2)
        for p in ["a", "b", "c"]:
            eng.generate_batch([p], [0])
        assert len(eng._embed_cache) == 2
        assert "a" not in eng._embed_cache  # oldest evicted
        # evicted prompt re-encodes; fresh ones hit
        eng.generate_batch(["c"], [0])
        assert eng.embed_hits == 1

    def test_cache_hit_matches_direct_generate(self, toy):
        """A cache-hit image equals pipe.generate's ids path bit-for-bit."""
        import serve

        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=4)
        eng.generate_batch(["a cat"], [11])  # fill
        via_cache = eng.generate_batch(["a cat"], [11])[0]["image"]
        assert eng.embed_hits >= 1
        via_pipe = serve.generate(pipe, tokenize, "a cat", 11, 4).images[0]
        np.testing.assert_array_equal(via_cache, via_pipe)


class TestMultiResolutionServing:
    """Per-request output resolution: requests coalesce per-resolution,
    each resolution is one compiled shape (PatchEmbed center-crops the pos
    table, so the backbone is size-flexible — same path as the 2048px
    bench leg)."""

    def _engine(self, toy, **kw):
        pipe, tokenize = toy
        # toy VAE upscales 2x: default resolution 8*2=16 px; extra 24 px
        # rides a 12x12 latent grid (within the toy pos table of 12)
        return BatchingEngine(
            pipe, tokenize, max_batch=2, window_ms=200, max_steps=3,
            vae_scale_factor=2, resolutions=[24], **kw,
        )

    def test_mixed_window_groups_by_resolution(self, toy):
        eng = self._engine(toy)
        assert eng.default_resolution == 16
        eng.start()
        try:
            a = eng.submit("a cat", seed=1)                  # default 16
            b = eng.submit("a cat", seed=1, resolution=24)   # 24 px
            ra, rb = a.result(timeout=300), b.result(timeout=300)
        finally:
            eng.stop()
        assert ra["image"].shape == (16, 16, 3)
        assert rb["image"].shape == (24, 24, 3)
        assert eng.batches_run == 2  # one sub-batch per resolution

    def test_default_resolution_unchanged_by_mixed_traffic(self, toy):
        eng = self._engine(toy)
        solo = eng.generate_batch(["a cat"], [7])[0]
        hi = eng.generate_batch(["a cat"], [7], resolution=24)[0]
        assert solo["image"].shape == (16, 16, 3)
        assert hi["image"].shape == (24, 24, 3)
        # default-res image matches an engine without multi-res configured
        pipe, tokenize = toy
        plain = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                               max_steps=3)
        ref = plain.generate_batch(["a cat"], [7])[0]
        np.testing.assert_array_equal(solo["image"], ref["image"])

    def test_unknown_resolution_rejected(self, toy):
        eng = self._engine(toy)
        with pytest.raises(ValueError, match="not in the served set"):
            eng.submit("a cat", resolution=999)

    def test_resolution_must_divide_scale(self, toy):
        pipe, tokenize = toy
        with pytest.raises(ValueError, match="multiple"):
            BatchingEngine(pipe, tokenize, vae_scale_factor=2,
                           resolutions=[23])


class TestMeshShardedQuantServing:
    """Stored-int8/int4 param trees survive GSPMD sharding: a quantized
    backbone served over the (2,2,2) mesh matches the unsharded engine
    (same off-by-one uint8 rounding allowance as the fp mesh test)."""

    @pytest.mark.parametrize("flag", ["int8", "int4"])
    def test_quant_mesh_matches_unsharded(self, flag):
        import argparse

        import serve

        args = argparse.Namespace(
            toy=True, cpu=True, pretrained=None, tpm=None, **{flag: True}
        )
        pipe1, tok1 = serve.build_pipeline(args)
        plain = BatchingEngine(pipe1, tok1, max_batch=2, window_ms=1,
                               max_steps=4)
        ref = plain.generate_batch(["a cat", "dog"], [3, 7])

        pipe2, tok2 = serve.build_pipeline(args)
        eng = BatchingEngine(pipe2, tok2, max_batch=4, window_ms=1,
                             max_steps=4, mesh_shape=(2, 2, 2))
        out = eng.generate_batch(["a cat", "dog", "a cat", "dog"],
                                 [3, 7, 3, 7])
        for r, o in zip(ref, out[:2]):
            assert r["inference_steps"] == o["inference_steps"]
            diff = np.abs(
                r["image"].astype(np.int32) - o["image"].astype(np.int32)
            )
            # w4 computes in fp like the plain path (seam <= 1); W8A8's
            # dynamic per-row activation scales amplify one-ULP cross-shard
            # differences (a shifted row max requantizes the whole row), so
            # int8 rounding seams reach a few uint8 levels on rare pixels
            # (observed 2 normally, 3 when foreign AOT cache entries load)
            bound = 3 if flag == "int8" else 1
            assert diff.max() <= bound, diff.max()
            # ... and they stay a minority of pixels. int8's budget is wider:
            # the dynamic per-row activation scales make the seam frequency
            # sensitive to ANY change in the compiled program (a one-ULP row
            # max shift requantizes the whole row), so unrelated jit-signature
            # changes move it between ~3% and ~8% of pixels.
            frac = (diff > 0).mean()
            assert frac < (0.25 if flag == "int8" else 0.05), frac


class TestPerRequestCFG:
    """Per-request guidance strength and negative prompts: guidance is a
    traced (b,) argument and negatives ride per-row embed slots, so any
    mix shares ONE compiled program with the uniform-guidance path."""

    def test_pipeline_scalar_vs_array_and_one_program(self, toy):
        pipe, tokenize = toy
        clip_ids, t5_ids = tokenize("a cat")
        kw = dict(
            clip_ids=clip_ids, t5_ids=t5_ids,
            negative_clip_ids=np.zeros_like(clip_ids),
            negative_t5_ids=np.zeros_like(t5_ids),
            max_inference_steps=3, seed=5, decode=False,
        )
        n0 = len(pipe._jit_cache)
        a = pipe.generate(guidance_scale=7.0, **kw)
        b = pipe.generate(guidance_scale=np.asarray([7.0]), **kw)
        c = pipe.generate(guidance_scale=3.0, **kw)
        np.testing.assert_array_equal(
            np.asarray(a.images), np.asarray(b.images)
        )
        assert np.abs(np.asarray(a.images) - np.asarray(c.images)).max() > 0
        # 7.0, [7.0], and 3.0 all ran on ONE new compiled program
        assert len(pipe._jit_cache) == n0 + 1

    def test_pipeline_mixed_guidance_rows_match_uniform(self, toy):
        """Per-sample math is row-independent: row i of a mixed-guidance
        batch equals row i of a uniform batch at that row's strength
        (identical program + identical per-row inputs => exact)."""
        import jax

        pipe, tokenize = toy
        c1, t1 = tokenize("a cat")
        c2, t2 = tokenize("a dog")
        clip_ids = np.concatenate([c1, c2])
        t5_ids = np.concatenate([t1, t2])
        mcfg = pipe.mmdit.config
        latents = jax.random.normal(
            jax.random.PRNGKey(0),
            (2, mcfg.in_channels, mcfg.sample_size, mcfg.sample_size),
            mcfg.dtype,
        )
        kw = dict(
            clip_ids=clip_ids, t5_ids=t5_ids,
            negative_clip_ids=np.zeros_like(clip_ids),
            negative_t5_ids=np.zeros_like(t5_ids),
            latents=latents, max_inference_steps=3, decode=False,
        )
        mixed = pipe.generate(guidance_scale=np.asarray([3.0, 7.0]), **kw)
        lo = pipe.generate(guidance_scale=3.0, **kw)
        hi = pipe.generate(guidance_scale=7.0, **kw)
        np.testing.assert_array_equal(
            np.asarray(mixed.images)[0], np.asarray(lo.images)[0]
        )
        np.testing.assert_array_equal(
            np.asarray(mixed.images)[1], np.asarray(hi.images)[1]
        )

    def test_engine_per_request_guidance_matches_engine_default(self, toy):
        """submit(guidance_scale=3) on a default-7 engine == an engine
        whose default IS 3 (same compiled program, same inputs: exact)."""
        pipe, tokenize = toy
        eng3 = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                              max_steps=4, guidance_scale=3.0)
        want = eng3.generate_batch(["a cat"], [7])[0]
        eng7 = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                              max_steps=4, guidance_scale=7.0)
        got = eng7.generate_batch(["a cat"], [7], guidances=[3.0])[0]
        np.testing.assert_array_equal(got["image"], want["image"])
        assert got["inference_steps"] == want["inference_steps"]

    def test_engine_negative_prompt_matches_pipeline_reference(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                             max_steps=4)
        got = eng.generate_batch(
            ["a cat", "a cat"], [7, 7],
            negative_prompts=["blurry, low quality", None],
        )
        clip_ids, t5_ids = tokenize("a cat")
        nc, nt = tokenize("blurry, low quality")
        # engine derives per-seed latents; rebuild them the same way
        import jax
        import jax.numpy as jnp

        mcfg = pipe.mmdit.config
        key_lat = jax.random.split(jax.random.PRNGKey(7))[0]
        lat = jax.random.normal(
            key_lat, (1, mcfg.in_channels, mcfg.sample_size,
                      mcfg.sample_size), mcfg.dtype,
        )
        ref = pipe.generate(
            clip_ids=np.concatenate([clip_ids, clip_ids]),
            t5_ids=np.concatenate([t5_ids, t5_ids]),
            negative_clip_ids=np.concatenate([nc, np.zeros_like(nc)]),
            negative_t5_ids=np.concatenate([nt, np.zeros_like(nt)]),
            latents=jnp.concatenate([lat, lat]),
            max_inference_steps=4,
        )
        for i in range(2):
            assert (
                np.abs(
                    got[i]["image"].astype(np.int16)
                    - np.asarray(ref.images)[i].astype(np.int16)
                ).max()
                <= 1  # different jit programs: allow the 1-level seam
            )
        # the two negatives genuinely condition differently
        assert np.abs(
            got[0]["image"].astype(np.int16)
            - got[1]["image"].astype(np.int16)
        ).max() > 1

    def test_validation(self, toy):
        pipe, tokenize = toy
        no_cfg = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                max_steps=3, guidance_scale=None)
        with pytest.raises(ValueError, match="CFG-enabled"):
            no_cfg.submit("a cat", guidance_scale=3.0)
        with pytest.raises(ValueError, match="CFG-enabled"):
            no_cfg.generate_batch(["a"], [1], negative_prompts=["bad"])
        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=3)
        with pytest.raises(ValueError, match="guidance"):
            eng.submit("a cat", guidance_scale=float("nan"))

    def test_http_roundtrip_guidance_and_negative(self, toy):
        """serve.py accepts guidance_scale / negative_prompt JSON fields."""
        import base64
        import http.client
        import json

        import serve

        pipe, tokenize = toy
        args = argparse.Namespace(
            max_steps=3, max_batch=2, batch_window_ms=10.0, dp=None,
            prompt="default", seed=1, port=0,
        )
        engine, server = serve.make_http_server(pipe, tokenize, args)
        engine.start()
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            port = server.server_address[1]
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request(
                "POST", "/generate",
                body=json.dumps(
                    {
                        "prompt": "a cat", "seed": 3,
                        "guidance_scale": 2.5,
                        "negative_prompt": "blurry",
                    }
                ),
            )
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()[:200]
            out = json.loads(resp.read())
            png = base64.b64decode(out["image_png_base64"])
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            assert 1 <= out["inference_steps"] <= 3
            # a bad negative type is a 400, not a wedged request
            conn.request(
                "POST", "/generate",
                body=json.dumps({"prompt": "a", "negative_prompt": 3}),
            )
            assert conn.getresponse().status == 400
        finally:
            server.shutdown()
            engine.stop()


class TestDeadlines:
    def test_expired_request_shed_fresh_request_served(self, toy):
        import time

        from tpdm_tpu.serving import RequestExpired

        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=2, window_ms=1,
                             max_steps=3)
        # enqueue BEFORE start so the deadline lapses while queued
        stale = eng.submit("a cat", seed=1, deadline_s=0.01)
        time.sleep(0.05)
        live = eng.submit("a dog", seed=2)
        eng.start()
        try:
            out = live.result(timeout=600)
            assert 1 <= out["inference_steps"] <= 3
            with pytest.raises(RequestExpired, match="waited"):
                stale.result(timeout=10)
            assert eng.stats()["requests_expired"] == 1
        finally:
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


class TestLoraAdapters:
    """Multi-tenant serving: per-request LoRA adapters over one backbone."""

    def test_routing_parity_and_base_restoration(self, toy):
        import jax

        from tpdm_tpu.models.lora import apply_lora

        pipe, tokenize = toy
        base_params = pipe.mmdit_params
        try:
            eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                 max_steps=4)
            lora_a = _noisy_lora(base_params, jax.random.PRNGKey(1))
            lora_b = _noisy_lora(base_params, jax.random.PRNGKey(2))
            eng.register_adapter("a", lora_a, scale=1.0, merged_cache=2)
            eng.register_adapter("b", lora_b, scale=1.0)

            base_img = eng.generate_batch(["a cat"], [7])[0]["image"]
            img_a = eng.generate_batch(["a cat"], [7], lora="a")[0]["image"]
            img_b = eng.generate_batch(["a cat"], [7], lora="b")[0]["image"]
            assert not np.array_equal(img_a, base_img)
            assert not np.array_equal(img_b, base_img)
            assert not np.array_equal(img_a, img_b)

            # parity: the adapter path == generating on a manually merged
            # tree (same executable, same operands -> bitwise equal)
            pipe.mmdit_params = apply_lora(base_params, lora_a, scale=1.0)
            direct = eng.generate_batch(["a cat"], [7])[0]["image"]
            # that batch ran with lora=None on an adapter-enabled engine, so
            # the engine restored the BASE tree operand; re-merge manually
            pipe.mmdit_params = base_params
            np.testing.assert_array_equal(
                np.asarray(eng.generate_batch(["a cat"], [7], lora="a")[0]["image"]),
                np.asarray(img_a),
            )
            # direct ran on the engine-restored base params (lora=None wins
            # over the manual assignment) -> equals the base image
            np.testing.assert_array_equal(direct, base_img)

            # base requests after adapter traffic reproduce the base image
            again = eng.generate_batch(["a cat"], [7])[0]["image"]
            np.testing.assert_array_equal(again, base_img)
        finally:
            pipe.mmdit_params = base_params

    def test_manual_merge_matches_adapter_path(self, toy):
        import jax

        from tpdm_tpu.models.lora import apply_lora

        pipe, tokenize = toy
        base_params = pipe.mmdit_params
        try:
            lora_a = _noisy_lora(base_params, jax.random.PRNGKey(3))
            # adapter-free engine on a manually merged tree
            pipe.mmdit_params = apply_lora(base_params, lora_a, scale=0.7)
            plain = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                   max_steps=4)
            direct = plain.generate_batch(["a dog"], [5])[0]["image"]
            pipe.mmdit_params = base_params

            eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                 max_steps=4)
            eng.register_adapter("a", lora_a, scale=0.7)
            via_adapter = eng.generate_batch(["a dog"], [5], lora="a")[0]["image"]
            np.testing.assert_array_equal(np.asarray(direct),
                                          np.asarray(via_adapter))
        finally:
            pipe.mmdit_params = base_params

    def test_mixed_window_groups_by_adapter(self, toy):
        import jax

        pipe, tokenize = toy
        base_params = pipe.mmdit_params
        try:
            eng = BatchingEngine(pipe, tokenize, max_batch=4, window_ms=200,
                                 max_steps=4)
            eng.register_adapter(
                "style", _noisy_lora(base_params, jax.random.PRNGKey(4))
            )
            solo_base = eng.generate_batch(["a cat"], [7])[0]["image"]
            solo_style = eng.generate_batch(["a cat"], [7], lora="style")[0]["image"]
            runs_before = eng.batches_run

            eng.start()
            try:
                reqs = [
                    eng.submit("a cat", seed=7),
                    eng.submit("a cat", seed=7, lora="style"),
                    eng.submit("a cat", seed=7, lora="style"),
                ]
                results = [r.result(timeout=120) for r in reqs]
            finally:
                eng.stop()
            np.testing.assert_array_equal(results[0]["image"], solo_base)
            np.testing.assert_array_equal(results[1]["image"], solo_style)
            np.testing.assert_array_equal(results[2]["image"], solo_style)
            # one window -> two sub-batches (base, style)
            assert eng.batches_run == runs_before + 2
            s = eng.stats()
            assert s["adapter_batches"]["<base>"] >= 2
            assert s["adapter_batches"]["style"] >= 2
        finally:
            pipe.mmdit_params = base_params

    def test_lru_eviction_stays_correct(self, toy):
        import jax

        pipe, tokenize = toy
        base_params = pipe.mmdit_params
        try:
            eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                                 max_steps=4)
            eng.register_adapter("a", _noisy_lora(base_params, jax.random.PRNGKey(5)))
            eng.register_adapter("b", _noisy_lora(base_params, jax.random.PRNGKey(6)))
            first_a = eng.generate_batch(["x"], [1], lora="a")[0]["image"]
            first_b = eng.generate_batch(["x"], [1], lora="b")[0]["image"]  # evicts a
            again_a = eng.generate_batch(["x"], [1], lora="a")[0]["image"]  # re-merge
            np.testing.assert_array_equal(first_a, again_a)
            assert eng.adapter_merges == 3  # cache size 1: a, b, a again
        finally:
            pipe.mmdit_params = base_params

    def test_unknown_adapter_rejected(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=4)
        with pytest.raises(ValueError, match="unknown adapter"):
            eng.submit("a cat", lora="nope")
        with pytest.raises(ValueError, match="unknown adapter"):
            eng.generate_batch(["a cat"], [0], lora="nope")

    def test_runner_engine_rejects_adapters(self):
        runner = lambda p, s, c: [
            {"image": np.zeros((4, 4, 3), np.uint8), "inference_steps": 1,
             "sigmas": [1.0]}
        ] * len(p)
        eng = BatchingEngine(None, tokenize=None, max_batch=1, runner=runner)
        with pytest.raises(ValueError, match="runner"):
            eng.register_adapter("a", {"k": {"a": np.zeros((2, 1)),
                                             "b": np.zeros((1, 2))}})

    def test_quantized_backbone_rejects_adapters(self, toy):
        import types

        import jax.numpy as jnp

        pipe, tokenize = toy
        fake = types.SimpleNamespace(
            mmdit=pipe.mmdit,
            mmdit_params={"w": jnp.zeros((2, 2), jnp.int8)},
            vae=None, vae_params=None, text_encoders=None,
        )
        eng = BatchingEngine(fake, tokenize, max_batch=1, window_ms=1,
                             max_steps=4)
        with pytest.raises(ValueError, match="quantized"):
            eng.register_adapter("a", {"k": {"a": np.zeros((2, 1)),
                                             "b": np.zeros((1, 2))}})


class TestLoraCliAndHttp:
    def test_split_lora_args(self):
        import serve

        ns = lambda v: argparse.Namespace(lora=v)
        assert serve._split_lora_args(ns(None)) == (None, [])
        assert serve._split_lora_args(ns(["/p/x.safetensors"])) == (
            "/p/x.safetensors", [])
        assert serve._split_lora_args(ns("/p/x.safetensors")) == (
            "/p/x.safetensors", [])  # legacy plain-string Namespace
        assert serve._split_lora_args(ns(["a=/p/a.st", "b=/p/b.st"])) == (
            None, [("a", "/p/a.st"), ("b", "/p/b.st")])
        with pytest.raises(SystemExit, match="mix"):
            serve._split_lora_args(ns(["/p/x.st", "a=/p/a.st"]))
        with pytest.raises(SystemExit, match="multiple bare"):
            serve._split_lora_args(ns(["/p/x.st", "/p/y.st"]))
        with pytest.raises(SystemExit, match="duplicate"):
            serve._split_lora_args(ns(["a=/p/a.st", "a=/p/b.st"]))

    def test_named_adapters_over_http(self, toy, tmp_path):
        import base64
        import http.client
        import json

        import jax

        import serve
        from tpdm_tpu.train.draft import save_lora

        pipe, tokenize = toy
        base_params = pipe.mmdit_params
        lora_a = _noisy_lora(base_params, jax.random.PRNGKey(11))
        lora_b = _noisy_lora(base_params, jax.random.PRNGKey(12))
        save_lora(str(tmp_path / "a.safetensors"), lora_a)
        save_lora(str(tmp_path / "b.safetensors"), lora_b)
        args = argparse.Namespace(
            max_steps=3, max_batch=2, batch_window_ms=10.0, dp=None,
            prompt="default", seed=1, port=0,
            lora=[f"a={tmp_path}/a.safetensors", f"b={tmp_path}/b.safetensors"],
            lora_scale=1.0, lora_cache=2,
        )
        try:
            engine, server = serve.make_http_server(pipe, tokenize, args)
            engine.start()
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
            try:
                port = server.server_address[1]

                def gen(body):
                    conn = http.client.HTTPConnection(
                        "127.0.0.1", port, timeout=600
                    )
                    conn.request("POST", "/generate", body=json.dumps(body))
                    resp = conn.getresponse()
                    data = resp.read()
                    return resp.status, data

                s0, base_png = gen({"prompt": "a cat", "seed": 7})
                sa, a_png = gen({"prompt": "a cat", "seed": 7, "lora": "a"})
                sb, b_png = gen({"prompt": "a cat", "seed": 7, "lora": "b"})
                assert (s0, sa, sb) == (200, 200, 200)
                imgs = [
                    json.loads(x)["image_png_base64"]
                    for x in (base_png, a_png, b_png)
                ]
                assert len({imgs[0], imgs[1], imgs[2]}) == 3  # all distinct

                status, _ = gen({"prompt": "a cat", "lora": "nope"})
                assert status == 400
                status, _ = gen({"prompt": "a cat", "lora": 42})
                assert status == 400

                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
                conn.request("GET", "/stats")
                stats = json.loads(conn.getresponse().read())
                assert stats["adapter_batches"]["a"] == 1
                assert stats["adapter_batches"]["b"] == 1
                assert stats["adapter_batches"]["<base>"] == 1
            finally:
                server.shutdown()
                engine.stop()
        finally:
            pipe.mmdit_params = base_params

    def test_lora_fused_requires_continuous_sd3(self, toy, tmp_path):
        import jax

        import serve
        from tpdm_tpu.train.draft import save_lora

        pipe, tokenize = toy
        save_lora(
            str(tmp_path / "a.safetensors"),
            _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(13)),
        )
        args = argparse.Namespace(
            max_steps=3, max_batch=2, batch_window_ms=10.0, dp=None,
            mesh=None, prompt="default", seed=1, port=0, continuous=False,
            seg_steps=2, lora=[f"a={tmp_path}/a.safetensors"],
            lora_scale=1.0, lora_cache=1, lora_fused=True,
        )
        with pytest.raises(SystemExit, match="continuous"):
            serve.make_http_server(pipe, tokenize, args)

    def test_named_adapters_on_continuous_http(self, toy, tmp_path):
        """--continuous + --lora NAME=PATH serves the adapter over HTTP
        (time-multiplexed segments, tpdm_tpu/serving_continuous.py
        register_adapter); the multi-res ROUTER still rejects."""
        import json
        from urllib import request as urlreq

        import jax

        import serve
        from tpdm_tpu.train.draft import save_lora

        pipe, tokenize = toy
        save_lora(
            str(tmp_path / "a.safetensors"),
            _noisy_lora(pipe.mmdit_params, jax.random.PRNGKey(13)),
        )
        args = argparse.Namespace(
            max_steps=3, max_batch=2, batch_window_ms=10.0, dp=None,
            mesh=None, prompt="default", seed=1, port=0, continuous=True,
            seg_steps=2, lora=[f"a={tmp_path}/a.safetensors"],
            lora_scale=1.0, lora_cache=1,
        )
        engine, server = serve.make_http_server(pipe, tokenize, args)
        engine.start()
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            port = server.server_address[1]

            def post_image(payload):
                import base64
                import io

                from PIL import Image

                body = json.dumps(payload).encode()
                r = urlreq.urlopen(
                    urlreq.Request(
                        f"http://127.0.0.1:{port}/generate", data=body,
                        headers={"Content-Type": "application/json"},
                    ),
                    timeout=600,
                )
                png = base64.b64decode(json.loads(r.read())["image_png_base64"])
                return np.asarray(Image.open(io.BytesIO(png)), np.int16)

            base = post_image({"prompt": "a cat", "seed": 7})
            tuned = post_image({"prompt": "a cat", "seed": 7, "lora": "a"})
            assert np.abs(base - tuned).max() > 1
        finally:
            server.shutdown()
            engine.stop()

        # the multi-res router still rejects named adapters
        args.resolutions = "24"
        with pytest.raises(SystemExit, match="router"):
            serve.make_http_server(pipe, tokenize, args)


class TestSolverOption:
    """BatchingEngine(solver='ab2'): second-order adaptive serving
    (SamplerConfig.solver threaded through pipe.generate)."""

    def test_ab2_engine_runs_deterministically(self, toy):
        pipe, tokenize = toy
        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=4, solver="ab2")
        out = eng.generate_batch(["a painting"], [7])
        again = eng.generate_batch(["a painting"], [7])
        assert out[0]["image"].shape == again[0]["image"].shape
        np.testing.assert_array_equal(out[0]["image"], again[0]["image"])
        assert 1 <= out[0]["inference_steps"] <= 4

    def test_rejections(self, toy):
        pipe, tokenize = toy
        with pytest.raises(ValueError, match="euler.*ab2|ab2.*euler"):
            BatchingEngine(pipe, tokenize, solver="heun")
        with pytest.raises(ValueError, match="family runners"):
            BatchingEngine(pipe, tokenize,
                           runner=lambda *a: None, solver="ab2")
