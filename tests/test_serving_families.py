"""Serving the SD1.5 and FLUX families through the shared BatchingEngine.

The reference serves only SD3 (gradio_sd3_inference.py); here the engine's
production machinery (coalescing, padding, stats) is family-agnostic via
the `runner` delegate (tpdm_tpu/serving_families.py), with per-request
seed determinism and per-request step caps for every family.
"""

import numpy as np
import pytest

from _toy_worlds import build_flux_world, build_sd15_world, tokenize_ids

from tpdm_tpu.serving import BatchingEngine

_tokenize_ids = tokenize_ids


@pytest.fixture(scope="module")
def sd15_world():
    return build_sd15_world()


@pytest.fixture(scope="module")
def flux_world():
    return build_flux_world()


def _noop_tokenize(prompt, n=8):
    return _tokenize_ids(prompt), np.ones((1, 12), np.int32)


class TestSD15Serving:
    def test_requests_coalesce_and_decode(self, sd15_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=3, window_ms=200, max_steps=4,
            runner=sd15_world["runner"],
        )
        eng.start()
        try:
            reqs = [eng.submit(f"prompt {i}", seed=i) for i in range(3)]
            results = [r.result(timeout=300) for r in reqs]
        finally:
            eng.stop()
        assert eng.batches_run == 1
        ss = sd15_world["sample_size"]
        for res in results:
            assert res["image"].shape == (2 * ss, 2 * ss, 3)
            assert res["image"].dtype == np.uint8
            assert 1 <= res["inference_steps"] <= 4
            # SD1.5 schedule entries are integer timesteps in [0, 999)
            assert all(0 <= t < 999 for t in res["sigmas"])

    def test_seed_parity_with_direct_pipeline(self, sd15_world):
        from tpdm_tpu.pipeline.variants import SD15Pipeline

        w = sd15_world
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=w["runner"],
        )
        via_engine = eng.generate_batch(["a cat"], [7])[0]["image"]
        pipe = SD15Pipeline(
            w["agent"], w["vae"], w["vae_params"], w["text"], w["text_params"]
        )
        ids = _tokenize_ids("a cat")
        direct = pipe.generate(
            clip_ids=ids, negative_clip_ids=np.zeros_like(ids), seed=7,
            tpm_params=w["tpm_params"],
        )
        # engine (batched runner jit) vs direct pipeline compile different
        # programs; XLA fusion may round bf16 1 ulp apart exactly at a
        # uint8 quantization boundary — allow the rare 1-level seam
        diff = np.abs(
            via_engine.astype(np.int16) - direct.images[0].astype(np.int16)
        )
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.01

    def test_same_seed_same_image_across_batch_compositions(self, sd15_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=sd15_world["runner"],
        )
        solo = eng.generate_batch(["a cat"], [9])[0]
        paired = eng.generate_batch(["a dog", "a cat"], [3, 9])[1]
        np.testing.assert_array_equal(solo["image"], paired["image"])

    def test_per_request_step_caps(self, sd15_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=sd15_world["runner"],
        )
        out = eng.generate_batch(
            ["a", "b"], [1, 2], steps=[2, None]
        )
        assert out[0]["inference_steps"] <= 2
        assert np.isfinite(out[0]["image"]).all() or out[0]["image"].dtype == np.uint8

    def test_runner_exclusive_with_placement(self, sd15_world):
        with pytest.raises(ValueError, match="runner"):
            BatchingEngine(
                None, _noop_tokenize, max_batch=2, dp=2,
                runner=sd15_world["runner"],
            )


class TestSDXLServing:
    @pytest.fixture(scope="class")
    def sdxl_world(self):
        from _toy_worlds import build_sdxl_world

        return build_sdxl_world()

    def test_requests_coalesce_and_decode(self, sdxl_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=3, window_ms=200, max_steps=4,
            runner=sdxl_world["runner"],
        )
        eng.start()
        try:
            reqs = [eng.submit(f"prompt {i}", seed=i) for i in range(3)]
            results = [r.result(timeout=300) for r in reqs]
        finally:
            eng.stop()
        assert eng.batches_run == 1
        ss = sdxl_world["sample_size"]
        for res in results:
            assert res["image"].shape == (2 * ss, 2 * ss, 3)
            assert res["image"].dtype == np.uint8
            assert 1 <= res["inference_steps"] <= 4
            assert all(0 <= t < 999 for t in res["sigmas"])

    def test_seed_parity_with_direct_pipeline(self, sdxl_world):
        from tpdm_tpu.pipeline.variants import SDXLPipeline

        w = sdxl_world
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=w["runner"],
        )
        via_engine = eng.generate_batch(["a cat"], [7])[0]["image"]
        pipe = SDXLPipeline(
            w["agent"], w["vae"], w["vae_params"],
            text_encoders=w["text_encoders"],
        )
        ids = tokenize_ids("a cat")
        direct = pipe.generate(
            clip_ids=ids, negative_clip_ids=np.zeros_like(ids), seed=7,
            tpm_params=w["tpm_params"],
        )
        diff = np.abs(
            via_engine.astype(np.int16) - direct.images[0].astype(np.int16)
        )
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.01

    def test_same_seed_same_image_across_batch_compositions(self, sdxl_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=sdxl_world["runner"],
        )
        solo = eng.generate_batch(["a cat"], [9])[0]
        paired = eng.generate_batch(["a dog", "a cat"], [3, 9])[1]
        np.testing.assert_array_equal(solo["image"], paired["image"])


class TestSDXLEnsembleServing:
    """base+refiner ensemble-of-experts behind the shared engine
    (serving_families.make_sdxl_ensemble_runner; serve.py --refiner)."""

    @pytest.fixture(scope="class")
    def ens_world(self):
        from _toy_worlds import build_sdxl_ensemble_world

        return build_sdxl_ensemble_world(max_steps=6)

    def test_two_experts_serve_one_request_stream(self, ens_world):
        w = ens_world
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=3, window_ms=200, max_steps=6,
            runner=w["ensemble_runner"],
        )
        eng.start()
        try:
            reqs = [eng.submit(f"prompt {i}", seed=i) for i in range(3)]
            results = [r.result(timeout=300) for r in reqs]
        finally:
            eng.stop()
        t_cut = int(round(999 * (1 - w["denoising_end"])))
        ss = w["sample_size"]
        for res in results:
            assert res["image"].shape == (2 * ss, 2 * ss, 3)
            assert res["image"].dtype == np.uint8
            assert res["inference_steps"] == (
                res["base_steps"] + res["refiner_steps"]
            )
            assert res["handoff_t"] < t_cut
            # realized trajectory crosses the cutoff exactly once
            ts = res["sigmas"]
            below = [t < t_cut for t in ts]
            assert below == sorted(below)

    def test_per_request_caps_bound_total_nfe(self, ens_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=6,
            runner=ens_world["ensemble_runner"],
        )
        out = eng.generate_batch(
            ["a cat", "a dog"], [1, 2], steps=[2, 6]
        )
        assert out[0]["inference_steps"] <= 2
        assert out[1]["inference_steps"] <= 6
        # both experts executed within each request's budget
        assert out[0]["base_steps"] >= 1 and out[0]["refiner_steps"] >= 1

    def test_same_seed_same_image_across_batch_compositions(self, ens_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=6,
            runner=ens_world["ensemble_runner"],
        )
        solo = eng.generate_batch(["a cat"], [9])[0]
        paired = eng.generate_batch(["a dog", "a cat"], [3, 9])[1]
        np.testing.assert_array_equal(solo["image"], paired["image"])

    def test_denoising_end_validation(self, ens_world):
        from tpdm_tpu.serving_families import make_sdxl_ensemble_runner

        w = ens_world
        with pytest.raises(ValueError, match="denoising_end"):
            make_sdxl_ensemble_runner(
                w["agent"], w["tpm_params"], w["refiner_agent"],
                w["refiner_tpm_params"], w["encode"], w["encode_refiner"],
                w["decode"], denoising_end=0.0,
            )


class TestFluxServing:
    def test_requests_coalesce_and_decode(self, flux_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=200, max_steps=4,
            runner=flux_world["runner"],
        )
        eng.start()
        try:
            reqs = [eng.submit(f"p {i}", seed=i) for i in range(2)]
            results = [r.result(timeout=300) for r in reqs]
        finally:
            eng.stop()
        assert eng.batches_run == 1
        for res in results:
            assert res["image"].shape == (16, 16, 3)
            assert res["image"].dtype == np.uint8
            assert 1 <= res["inference_steps"] <= 4
            assert all(0.0 <= s <= 1.0 for s in res["sigmas"])

    def test_same_seed_same_image_across_batch_compositions(self, flux_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=flux_world["runner"],
        )
        solo = eng.generate_batch(["a cat"], [5])[0]
        paired = eng.generate_batch(["a dog", "a cat"], [1, 5])[1]
        np.testing.assert_array_equal(solo["image"], paired["image"])

    def test_per_request_step_caps(self, flux_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=flux_world["runner"],
        )
        out = eng.generate_batch(["a", "b"], [1, 2], steps=[1, None])
        assert out[0]["inference_steps"] == 1

    def test_stats_tolerate_runner_records(self, flux_world):
        """Runner-path stage records carry no tokenize_s/decode_s; stats()
        must aggregate what exists instead of KeyError-ing (regression:
        GET /stats during family serving crashed the handler)."""
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=flux_world["runner"],
        )
        eng.generate_batch(["a"], [1])
        s = eng.stats()
        assert s["batches_run"] == 1
        assert s["device_s_p50"] > 0
        assert s["tokenize_s_p50"] == 0.0
        assert s["padded_slots"] == 1


class TestFluxInt8Serving:
    def test_build_family_world_int8_serves(self):
        """serve.py --family flux --int8: the backbone param tree is
        stored-int8 (prequantized) and requests still serve end-to-end."""
        import argparse

        import jax.numpy as jnp

        import serve

        args = argparse.Namespace(
            family="flux", toy=True, cpu=True, pretrained=None, tpm=None,
            max_steps=3, int8=True,
        )
        world = serve.build_family_world(args)
        p = world["agent"].flux_params["params"]
        assert p["double_blocks_0"]["img_attn_to_q"]["kernel"].dtype == jnp.int8
        assert p["single_blocks_0"]["modulation"]["lin"]["kernel"].dtype == jnp.int8
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=5,
            max_steps=3, runner=world["runner"],
        )
        out = eng.generate_batch(["a cat", "blue bird"], [3, 7])
        for r in out:
            assert r["image"].shape == (16, 16, 3)
            assert 1 <= r["inference_steps"] <= 3


class TestInt4Serving:
    """--int4: group-int4 weight-only backbones (the 4x capacity tier)."""

    def test_sd3_toy_int4_serves(self):
        import argparse

        import jax.numpy as jnp

        import serve

        args = argparse.Namespace(
            toy=True, cpu=True, pretrained=None, tpm=None, int4=True
        )
        pipe, tokenize = serve.build_pipeline(args)
        blk = pipe.mmdit_params["params"]["transformer_blocks_0"]
        assert blk["attn"]["to_q"]["kernel"].dtype == jnp.int4
        assert blk["attn"]["to_q"]["kernel_scale"].ndim == 2
        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=4)
        r = eng.generate_batch(["a cat"], [3])[0]
        assert r["image"].shape == (16, 16, 3)
        assert 1 <= r["inference_steps"] <= 4

    def test_flux_family_int4_serves(self):
        import argparse

        import jax.numpy as jnp

        import serve

        args = argparse.Namespace(
            family="flux", toy=True, cpu=True, pretrained=None, tpm=None,
            max_steps=3, int4=True,
        )
        world = serve.build_family_world(args)
        p = world["agent"].flux_params["params"]
        assert p["single_blocks_0"]["linear1"]["kernel"].dtype == jnp.int4
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=1, window_ms=5,
            max_steps=3, runner=world["runner"],
        )
        r = eng.generate_batch(["a cat"], [3])[0]
        assert r["image"].shape == (16, 16, 3)

    def test_int8_and_int4_mutually_exclusive(self):
        import argparse

        import pytest as _pytest

        import serve

        args = argparse.Namespace(int8=True, int4=True)
        with _pytest.raises(SystemExit, match="mutually exclusive"):
            serve._quant_on(args)


class TestSD15QuantRejected:
    def test_family_sd15_int8_fails_loudly(self):
        """--family sd15 --int8 must not silently serve full precision."""
        import argparse

        import pytest as _pytest

        import serve

        args = argparse.Namespace(
            family="sd15", toy=True, cpu=True, pretrained=None, tpm=None,
            max_steps=3, int8=True, int4=False,
        )
        with _pytest.raises(SystemExit, match="not supported"):
            serve.build_family_world(args)


class TestQuantTextToy:
    def test_toy_pipeline_quant_text_stores_int8_t5(self):
        """serve.py --toy --quant_text must not be a silent no-op."""
        import argparse

        import jax.numpy as jnp

        import serve

        pipe, _ = serve.build_pipeline(argparse.Namespace(
            toy=True, cpu=True, pretrained=None, tpm=None, quant_text=True
        ))
        tp = pipe.text_encoders.t5[1]
        assert tp["params"]["block_0"]["attention"]["q"]["kernel"].dtype \
            == jnp.int8
