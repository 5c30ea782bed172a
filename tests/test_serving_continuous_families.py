"""Continuous batching for the SD1.5 and FLUX families.

Correctness bar (like test_serving_continuous.py's mesh tests): with
predict=True a request's SCHEDULE and step count must exactly match the
fixed-batch runner path for the same (prompt, seed, cap), no matter when
it joined a slot or what shared its segments — the segment bodies mirror
`sd15_adaptive_sample` / `adaptive_sample`. Images may differ by 1 uint8
LSB: the segment scan (batch = slots) and the solo while_loop (batch = 1)
are different XLA programs whose f32 results can differ in the last ulp,
which flips a pixel sitting exactly on a quantization boundary.
"""

import argparse

import numpy as np
import pytest

from _toy_worlds import build_flux_world, build_sd15_world

from tpdm_tpu.serving import BatchingEngine
from tpdm_tpu.serving_continuous import (
    ContinuousFluxEngine,
    ContinuousSD15Engine,
    ContinuousSDXLEngine,
)


@pytest.fixture(scope="module")
def sd15_world():
    return build_sd15_world()


@pytest.fixture(scope="module")
def flux_world():
    return build_flux_world()


def _noop_tokenize(prompt, _n=None):
    return None, None


REQUESTS = [("a cat", 3, None), ("a dog on a hill", 7, 2),
            ("blue bird", 11, None), ("a cat", 3, None),
            ("red square", 23, 1)]


def _fixed_reference(world, requests, max_steps=4):
    """Each (prompt, seed, cap) run SOLO through the fixed-batch runner
    engine — the batch-1 oracle every slot trajectory must reproduce."""
    eng = BatchingEngine(None, _noop_tokenize, max_batch=1, window_ms=1,
                         max_steps=max_steps, runner=world["runner"])
    return {
        (p, s, c): eng.generate_batch([p], [s], steps=[c])[0]
        for p, s, c in set(requests)
    }


def _drive_continuous(eng, requests):
    eng.start()
    try:
        reqs = [(k, eng.submit(k[0], seed=k[1], steps=k[2]))
                for k in requests]
        return [(k, r.result(timeout=600)) for k, r in reqs]
    finally:
        eng.stop()


def _assert_images_within_1lsb(got, exp, key):
    diff = np.abs(
        got.astype(np.int64) - exp.astype(np.int64)
    ).max()
    assert diff <= 1, f"{key}: image off by {diff} > 1 LSB"


class TestContinuousSD15:
    def test_parity_with_fixed_runner(self, sd15_world):
        """5 requests (mixed caps) through 2 recycled slots == each run
        solo through make_sd15_runner: exact schedules, images <= 1 LSB."""
        w = sd15_world
        want = _fixed_reference(w, REQUESTS)
        eng = ContinuousSD15Engine(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=2, seg_steps=2,
        )
        for k, got in _drive_continuous(eng, REQUESTS):
            exp = want[k]
            assert got["inference_steps"] == exp["inference_steps"], k
            # SD1.5 schedules are integer timesteps — must match exactly
            assert [int(t) for t in got["sigmas"]] == exp["sigmas"], k
            _assert_images_within_1lsb(got["image"], exp["image"], k)

    def test_one_compiled_shape_and_stats(self, sd15_world):
        w = sd15_world
        eng = ContinuousSD15Engine(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=2, seg_steps=1,
        )
        got = _drive_continuous(eng, REQUESTS[:3])
        assert eng.segment_traces == 1
        s = eng.stats()
        assert s["requests_done"] == 3
        assert s["slot_steps_active"] == sum(
            r["inference_steps"] for _, r in got
        )
        assert 0 < s["slot_utilization"] <= 1.0

    def test_rejects_per_request_resolution(self, sd15_world):
        w = sd15_world
        eng = ContinuousSD15Engine(
            w["agent"], w["encode"], tpm_params=w["tpm_params"], slots=1,
        )
        with pytest.raises(ValueError, match="resolution"):
            eng.submit("x", resolution=512)


class TestContinuousSDXL:
    @pytest.fixture(scope="class")
    def sdxl_world(self):
        from _toy_worlds import build_sdxl_world

        return build_sdxl_world()

    def test_parity_with_fixed_runner(self, sdxl_world):
        """SDXL slot recycling == solo make_sdxl_runner runs: exact
        integer-t schedules, images <= 1 LSB (pooled + time_ids threaded
        through the segment's CFG)."""
        w = sdxl_world
        want = _fixed_reference(w, REQUESTS)
        eng = ContinuousSDXLEngine(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=2, seg_steps=2,
        )
        for k, got in _drive_continuous(eng, REQUESTS):
            exp = want[k]
            assert got["inference_steps"] == exp["inference_steps"], k
            assert [int(t) for t in got["sigmas"]] == exp["sigmas"], k
            _assert_images_within_1lsb(got["image"], exp["image"], k)

    def test_adapters_require_fused(self, sdxl_world):
        """SDXL adapters exist since the round-4 trainer extension, but
        family engines serve them fused-only."""
        w = sdxl_world
        eng = ContinuousSDXLEngine(
            w["agent"], w["encode"], tpm_params=w["tpm_params"], slots=1,
        )
        with pytest.raises(ValueError, match="fused-only"):
            eng.register_adapter(
                "a", {"k": {"a": np.zeros((2, 1)), "b": np.zeros((1, 2))}}
            )


class TestContinuousFlux:
    def test_parity_with_fixed_runner(self, flux_world):
        w = flux_world
        want = _fixed_reference(w, REQUESTS)
        eng = ContinuousFluxEngine(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=2, seg_steps=2,
        )
        for k, got in _drive_continuous(eng, REQUESTS):
            exp = want[k]
            assert got["inference_steps"] == exp["inference_steps"], k
            # f32 sigma traces from two different jit graphs (scan-segment
            # vs while_loop): allow float-ulp slack, like the SD3 test
            np.testing.assert_allclose(got["sigmas"], exp["sigmas"],
                                       rtol=1e-5, atol=1e-8)
            _assert_images_within_1lsb(got["image"], exp["image"], k)

    def test_one_compiled_shape(self, flux_world):
        w = flux_world
        eng = ContinuousFluxEngine(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=2, seg_steps=1,
        )
        _drive_continuous(eng, REQUESTS[:3])
        assert eng.segment_traces == 1


def _noisy_lora(params, key, rank=2, scale_b=0.05):
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


class TestFluxFusedAdapters:
    """Multi-tenant FLUX serving: fused-only (per-slot rank-r deltas via
    models/lora.py lora_interceptor — a 12B-class merged copy per tenant
    would not fit, so there is no multiplex path for families)."""

    def test_fused_mixed_pool_vs_merged_solo(self, flux_world):
        import copy

        import jax

        from tpdm_tpu.models.lora import apply_lora
        from tpdm_tpu.serving_families import make_flux_runner

        w = flux_world
        lora = _noisy_lora(w["agent"].flux_params, jax.random.PRNGKey(4))

        # oracle: a solo fixed-batch runner over MANUALLY merged weights
        merged_agent = copy.copy(w["agent"])
        merged_agent.flux_params = apply_lora(w["agent"].flux_params, lora)
        merged_runner = make_flux_runner(
            merged_agent, w["tpm_params"], w["encode"], w["decode"]
        )
        ref_tuned = BatchingEngine(
            None, _noop_tokenize, max_batch=1, window_ms=1, max_steps=4,
            runner=merged_runner,
        ).generate_batch(["a cat"], [3])[0]
        ref_base = _fixed_reference(w, [("a cat", 3, None)])[
            ("a cat", 3, None)
        ]

        eng = ContinuousFluxEngine(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=2, seg_steps=2,
            fused_lora=True,
        )
        eng.register_adapter("style", lora)
        eng.start()
        try:
            rb = eng.submit("a cat", seed=3)
            rt = eng.submit("a cat", seed=3, lora="style")
            base = rb.result(timeout=600)
            tuned = rt.result(timeout=600)
        finally:
            eng.stop()
        # base slots ride an exact zero delta: 1-LSB program seam only
        _assert_images_within_1lsb(
            base["image"], ref_base["image"], "base"
        )
        # adapter slot ~ merged oracle (fused rounds W and x@AB
        # separately: small, bounded gap), and visibly not the base
        assert tuned["inference_steps"] == ref_tuned["inference_steps"]
        diff = np.abs(
            tuned["image"].astype(np.int16)
            - ref_tuned["image"].astype(np.int16)
        )
        assert diff.max() <= 24, diff.max()
        assert diff.mean() < 3.0
        assert (
            np.abs(
                tuned["image"].astype(np.int16)
                - base["image"].astype(np.int16)
            ).max()
            > 1
        )
        assert eng.stats()["lora_mode"] == "fused"

    def test_family_adapters_require_fused(self, flux_world):
        import jax

        w = flux_world
        eng = ContinuousFluxEngine(
            w["agent"], w["encode"], tpm_params=w["tpm_params"], slots=1,
        )
        with pytest.raises(ValueError, match="fused-only"):
            eng.register_adapter(
                "x", _noisy_lora(w["agent"].flux_params, jax.random.PRNGKey(1))
            )

    def test_sd15_adapters_require_fused_too(self, sd15_world):
        import jax

        w = sd15_world
        eng = ContinuousSD15Engine(
            w["agent"], w["encode"], tpm_params=w["tpm_params"], slots=1,
        )
        with pytest.raises(ValueError, match="fused-only"):
            eng.register_adapter(
                "x", _noisy_lora(w["agent"].unet_params, jax.random.PRNGKey(1))
            )

    def test_embed_cache_dedupes_repeat_prompts(self, flux_world):
        w = flux_world
        eng = ContinuousFluxEngine(
            w["agent"], w["encode"], tpm_params=w["tpm_params"],
            slots=1, seg_steps=2, embed_cache_size=8,
        )
        eng.start()
        try:
            for seed in (1, 2):
                eng.submit("same prompt", seed=seed).result(timeout=600)
        finally:
            eng.stop()
        assert eng.stats()["embed_cache_entries"] == 1


class TestShardedFamilies:
    """dp / mesh_shape legs for the family engines.

    Each test builds a FRESH world (the builders are PRNGKey-deterministic,
    so weights equal the module fixture's): placement setup commits / shards
    the agent's params in place, which must not leak into the shared
    fixtures. Per-shard slot batch is kept >= 2 everywhere — the regime
    that exposes XLA SPMD row-mixing partitioner bugs (CLAUDE.md landmine;
    see tests/test_parallel.py sharded-forward test).
    """

    def _check(self, world, eng):
        want = _fixed_reference(world, REQUESTS)
        for k, got in _drive_continuous(eng, REQUESTS):
            exp = want[k]
            assert got["inference_steps"] == exp["inference_steps"], k
            _assert_images_within_1lsb(got["image"], exp["image"], k)

    def test_sd15_dp(self):
        w = build_sd15_world()
        eng = ContinuousSD15Engine(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=4, seg_steps=2, dp=2,
        )
        assert eng._mesh is not None and eng._state_shardings is not None
        self._check(w, eng)

    def test_flux_dp(self):
        w = build_flux_world()
        eng = ContinuousFluxEngine(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=4, seg_steps=2, dp=2,
        )
        assert eng._mesh is not None and eng._state_shardings is not None
        self._check(w, eng)

    def test_sd15_mesh_sharded_model(self):
        # (2,2,2): UNet sharded incl. the tensor axis via SD15Agent.shard;
        # slots over (data, fsdp) = 4 shards x 2 slots each
        w = build_sd15_world()
        eng = ContinuousSD15Engine(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=8, seg_steps=2,
            mesh_shape=(2, 2, 2),
        )
        self._check(w, eng)

    def test_flux_mesh_sharded_model(self):
        w = build_flux_world()
        eng = ContinuousFluxEngine(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=8, seg_steps=2,
            mesh_shape=(2, 2, 2),
        )
        self._check(w, eng)

    def test_bad_slot_shapes_rejected(self):
        w = build_sd15_world()
        with pytest.raises(ValueError, match="divisible"):
            ContinuousSD15Engine(
                w["agent"], w["encode"], tpm_params=w["tpm_params"],
                slots=3, dp=2,
            )


class TestServeCLIWiring:
    @pytest.mark.parametrize("family,cls", [
        ("sd15", ContinuousSD15Engine), ("sdxl", ContinuousSDXLEngine),
        ("flux", ContinuousFluxEngine),
    ])
    def test_http_server_builds_family_continuous_engine(self, family, cls):
        import serve

        args = argparse.Namespace(
            toy=True, cpu=True, family=family, max_steps=3, max_batch=2,
            batch_window_ms=10.0, dp=None, mesh=None, continuous=True,
            seg_steps=1, prompt="d", seed=1, port=0,
        )
        world = serve.build_family_world(args)
        engine, server = serve.make_http_server(
            None, _noop_tokenize, args, runner=world["runner"],
            family_world=world,
        )
        try:
            assert isinstance(engine, cls)
            engine.start()
            got = engine.submit("a cat", seed=7).result(timeout=600)
            assert 1 <= got["inference_steps"] <= engine.max_steps
            assert got["image"].dtype == np.uint8
        finally:
            server.server_close()
            engine.stop()

    def test_flux_fused_adapters_over_cli(self, tmp_path):
        """--family flux --continuous --lora_fused --lora NAME=PATH:
        the adapter registers on the fused continuous engine and a
        {"lora": NAME} request visibly changes the output."""
        import jax

        import serve
        from tpdm_tpu.train.draft import save_lora

        args = argparse.Namespace(
            toy=True, cpu=True, family="flux", max_steps=3, max_batch=2,
            batch_window_ms=10.0, dp=None, mesh=None, continuous=True,
            seg_steps=1, prompt="d", seed=1, port=0, lora_fused=True,
            lora_scale=1.0, lora_cache=1,
        )
        world = serve.build_family_world(args)
        save_lora(
            str(tmp_path / "s.safetensors"),
            _noisy_lora(world["agent"].flux_params, jax.random.PRNGKey(4)),
        )
        args.lora = [f"s={tmp_path}/s.safetensors"]
        engine, server = serve.make_http_server(
            None, _noop_tokenize, args, runner=world["runner"],
            family_world=world,
        )
        try:
            assert isinstance(engine, ContinuousFluxEngine)
            assert engine.fused_lora and "s" in engine._adapters
            engine.start()
            base = engine.submit("a cat", seed=7).result(timeout=600)
            tuned = engine.submit(
                "a cat", seed=7, lora="s"
            ).result(timeout=600)
            assert (
                np.abs(
                    base["image"].astype(np.int16)
                    - tuned["image"].astype(np.int16)
                ).max()
                > 1
            )
        finally:
            server.server_close()
            engine.stop()

    def test_flux_fused_adapters_over_int8_backbone(self, tmp_path):
        """QLoRA-style family serving: --family flux --int8 --continuous
        --lora_fused — the interceptor's delta rides next to the
        stored-int8 matmuls (DenseMaybeQuant), no float merge needed."""
        import jax
        import jax.numpy as jnp

        import serve
        from tpdm_tpu.train.draft import save_lora

        args = argparse.Namespace(
            toy=True, cpu=True, family="flux", max_steps=3, max_batch=2,
            batch_window_ms=10.0, dp=None, mesh=None, continuous=True,
            seg_steps=1, prompt="d", seed=1, port=0, lora_fused=True,
            lora_scale=1.0, lora_cache=1, int8=True,
        )
        world = serve.build_family_world(args)
        leaf = jax.tree.leaves(world["agent"].flux_params)
        assert any(getattr(x, "dtype", None) == jnp.int8 for x in leaf)
        save_lora(
            str(tmp_path / "s.safetensors"),
            _noisy_lora(world["agent"].flux_params, jax.random.PRNGKey(4)),
        )
        args.lora = [f"s={tmp_path}/s.safetensors"]
        engine, server = serve.make_http_server(
            None, _noop_tokenize, args, runner=world["runner"],
            family_world=world,
        )
        try:
            assert isinstance(engine, ContinuousFluxEngine)
            engine.start()
            base = engine.submit("a cat", seed=7).result(timeout=600)
            tuned = engine.submit(
                "a cat", seed=7, lora="s"
            ).result(timeout=600)
            assert (
                np.abs(
                    base["image"].astype(np.int16)
                    - tuned["image"].astype(np.int16)
                ).max()
                > 1
            )
        finally:
            server.server_close()
            engine.stop()

    def test_sd15_fused_missing_adapter_fails_loudly(self, tmp_path):
        """SD1.5 fused serving is supported since the eps-family LoRA
        trainers landed (the old world-build rejection is gone); the CLI
        contract now is: the world builds, and a bad --lora NAME=PATH
        fails LOUDLY at server build when the adapter file loads — never
        silently serving base weights."""
        import serve

        args = argparse.Namespace(
            toy=True, cpu=True, family="sd15", max_steps=3, max_batch=2,
            batch_window_ms=10.0, dp=None, mesh=None, continuous=True,
            seg_steps=1, prompt="d", seed=1, port=0, lora_fused=True,
            lora=["s=/nonexistent.safetensors"], lora_scale=1.0,
            lora_cache=1,
        )
        world = serve.build_family_world(args)
        with pytest.raises((FileNotFoundError, OSError)):
            serve.make_http_server(
                None, _noop_tokenize, args, runner=world["runner"],
                family_world=world,
            )


class TestEpsFamilyFusedAdapters:
    """Multi-tenant LoRA on the eps-prediction family engines: SD1.5 /
    SDXL trainers now produce adapters (train/draft.py, train/dpo.py
    round-4), so the continuous engines serve them fused — per-slot
    rank-r deltas via lora_interceptor, with the CFG row-doubling
    mirrored onto the bank ids ([uncond; cond] both get the slot's
    adapter, as diffusers applies LoRA)."""

    def _fused_case(self, world, engine_cls, runner_maker):
        import copy

        import jax

        from tpdm_tpu.models.lora import apply_lora

        w = world
        lora = _noisy_lora(w["agent"].unet_params, jax.random.PRNGKey(4))

        merged_agent = copy.copy(w["agent"])
        merged_agent.unet_params = apply_lora(w["agent"].unet_params, lora)
        merged_runner = runner_maker(
            merged_agent, w["tpm_params"], w["encode"], w["decode"]
        )
        ref_tuned = BatchingEngine(
            None, _noop_tokenize, max_batch=1, window_ms=1, max_steps=4,
            runner=merged_runner,
        ).generate_batch(["a cat"], [3])[0]
        ref_base = _fixed_reference(w, [("a cat", 3, None)])[
            ("a cat", 3, None)
        ]

        eng = engine_cls(
            w["agent"], w["encode"], decode=w["decode"],
            tpm_params=w["tpm_params"], slots=2, seg_steps=2,
            fused_lora=True,
        )
        eng.register_adapter("style", lora)
        eng.start()
        try:
            rb = eng.submit("a cat", seed=3)
            rt = eng.submit("a cat", seed=3, lora="style")
            base = rb.result(timeout=600)
            tuned = rt.result(timeout=600)
        finally:
            eng.stop()
        # base slots ride an exact zero delta: 1-LSB program seam only
        _assert_images_within_1lsb(base["image"], ref_base["image"], "base")
        # adapter slot ~ merged oracle; integer-t schedules must be EXACT
        assert tuned["inference_steps"] == ref_tuned["inference_steps"]
        assert [int(t) for t in tuned["sigmas"]] == ref_tuned["sigmas"]
        diff = np.abs(
            tuned["image"].astype(np.int16)
            - ref_tuned["image"].astype(np.int16)
        )
        assert diff.max() <= 24, diff.max()
        assert diff.mean() < 3.0
        assert (
            np.abs(
                tuned["image"].astype(np.int16)
                - base["image"].astype(np.int16)
            ).max()
            > 1
        )
        assert eng.stats()["lora_mode"] == "fused"

    def test_sd15_fused_mixed_pool_vs_merged_solo(self, sd15_world):
        from tpdm_tpu.serving_families import make_sd15_runner

        self._fused_case(sd15_world, ContinuousSD15Engine, make_sd15_runner)

    def test_sdxl_fused_mixed_pool_vs_merged_solo(self):
        from _toy_worlds import build_sdxl_world

        from tpdm_tpu.serving_families import make_sdxl_runner

        self._fused_case(
            build_sdxl_world(), ContinuousSDXLEngine, make_sdxl_runner
        )
