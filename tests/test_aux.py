"""Aux subsystems: data layer, native loader, config resolver, checkpoints,
callbacks."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def jsonl_file(tmp_path):
    rows = [
        {"prompt": "a cat"},
        {"prompt": 'escaped "quote" and \\ backslash'},
        {"prompt": "unicode: café ☃"},
        {"prompt": "The image shows a dog"},
    ]
    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p), rows


class TestNativeLoader:
    def test_matches_python_json(self, jsonl_file):
        path, rows = jsonl_file
        from tpdm_tpu.data.native import read_jsonl_field

        vals = read_jsonl_field(path, "prompt")
        assert vals == [r["prompt"] for r in rows]

    def test_missing_key_skipped(self, tmp_path):
        p = tmp_path / "x.jsonl"
        p.write_text('{"other": "x"}\n{"prompt": "y"}\n')
        from tpdm_tpu.data.native import read_jsonl_field

        assert read_jsonl_field(str(p), "prompt") == ["y"]

    def test_missing_file_raises(self):
        from tpdm_tpu.data.native import read_jsonl_field

        with pytest.raises(OSError):
            read_jsonl_field("/nonexistent/file.jsonl", "prompt")


class TestDatasets:
    def test_jsonl_dataset_shuffled_deterministic(self, jsonl_file):
        path, rows = jsonl_file
        from tpdm_tpu.data import JsonlPromptDataset

        d1 = JsonlPromptDataset(path)
        d2 = JsonlPromptDataset(path)
        assert len(d1) == len(rows)
        assert [r["prompt"] for r in d1.rows] == [r["prompt"] for r in d2.rows]
        assert {r["prompt"] for r in d1.rows} == {r["prompt"] for r in rows}

    def test_native_and_python_paths_agree(self, jsonl_file):
        path, _ = jsonl_file
        from tpdm_tpu.data import JsonlPromptDataset

        dn = JsonlPromptDataset(path, use_native=True)
        dp = JsonlPromptDataset(path, use_native=False)
        assert [r["prompt"] for r in dn.rows] == [r["prompt"] for r in dp.rows]

    def test_collate_strips_prefix(self):
        from tpdm_tpu.data import json_prompt_collate

        out = json_prompt_collate(
            [{"prompt": "The image shows a dog"}, {"prompt": "a cat"}]
        )
        assert out["prompt"] == ["a dog", "a cat"]

    def test_webdataset_tar(self, tmp_path):
        import tarfile
        import io

        tar_path = tmp_path / "shard.tar"
        with tarfile.open(tar_path, "w") as tar:
            for i in range(5):
                payload = json.dumps({"caption": f"cap {i}"}).encode()
                info = tarfile.TarInfo(name=f"{i:04d}.json")
                info.size = len(payload)
                tar.addfile(info, io.BytesIO(payload))
        from tpdm_tpu.data import WebDatasetPrompts, webdataset_prompt_collate

        ds = WebDatasetPrompts(str(tar_path), buffer_size=2)
        rows = list(ds)
        assert len(rows) == 5
        out = webdataset_prompt_collate(rows[:2])
        assert all(p.startswith("cap ") for p in out["prompt"])

    def test_example_prompts_load(self):
        from tpdm_tpu.data import JsonlPromptDataset

        d = JsonlPromptDataset("example/prompts.jsonl")
        assert len(d) >= 30
        assert all("prompt" in r for r in d.rows)

    def test_preference_pairs_npy_and_images(self, tmp_path):
        """PreferencePairDataset (train/dpo.py input): lazy npy latents,
        relative-to-manifest paths, image rows as uint8 RGB."""
        import json

        import numpy as np
        from PIL import Image

        from tpdm_tpu.data.datasets import PreferencePairDataset

        rng = np.random.default_rng(0)
        np.save(tmp_path / "w.npy", rng.normal(size=(4, 8, 8)).astype("f4"))
        np.save(tmp_path / "l.npy", rng.normal(size=(4, 8, 8)).astype("f4"))
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        ).save(tmp_path / "w.png")
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        ).save(tmp_path / "l.png")
        manifest = tmp_path / "pairs.jsonl"
        manifest.write_text(
            json.dumps(
                {"prompt": "a", "latents_w": "w.npy", "latents_l": "l.npy"}
            )
            + "\n"
            + json.dumps(
                {"prompt": "b", "image_w": "w.png", "image_l": "l.png"}
            )
            + "\n"
        )
        d = PreferencePairDataset(str(manifest))
        assert len(d) == 2
        rows = {d[i]["prompt"]: d[i] for i in range(2)}
        assert rows["a"]["latents_w"].shape == (4, 8, 8)
        assert rows["a"]["latents_w"].dtype == np.float32
        assert rows["b"]["images_w"].shape == (16, 16, 3)
        assert rows["b"]["images_l"].dtype == np.uint8

    def test_preference_pairs_bad_rows_fail_loudly(self, tmp_path):
        import json

        import numpy as np
        import pytest

        from tpdm_tpu.data.datasets import PreferencePairDataset

        bad = tmp_path / "bad.jsonl"
        bad.write_text(json.dumps({"prompt": "x", "latents_w": "w.npy"}))
        with pytest.raises(ValueError, match="latents_w/latents_l"):
            PreferencePairDataset(str(bad))
        # wrong latent rank fails at load, not deep inside the trainer
        np.save(tmp_path / "flat.npy", np.zeros((8,), "f4"))
        m = tmp_path / "rank.jsonl"
        m.write_text(
            json.dumps(
                {
                    "prompt": "x",
                    "latents_w": "flat.npy",
                    "latents_l": "flat.npy",
                }
            )
        )
        d = PreferencePairDataset(str(m))
        with pytest.raises(ValueError, match="c, h, w"):
            d[0]


class TestInstantiate:
    def test_target_and_partial(self, tmp_path):
        from tpdm_tpu.utils.instantiate import instantiate

        built = instantiate(
            {"_target_": "collections.OrderedDict", "a": 1, "b": {"c": 2}}
        )
        assert built["a"] == 1 and built["b"] == {"c": 2}

        part = instantiate({"_target_": "operator.add", "_partial_": True})
        assert part(2, 3) == 5

    def test_nested_instantiation(self):
        from tpdm_tpu.utils.instantiate import instantiate

        out = instantiate(
            {
                "_target_": "builtins.dict",
                "inner": {
                    "_target_": "fractions.Fraction",
                    "numerator": 1,
                    "denominator": 2,
                },
            }
        )
        from fractions import Fraction

        assert out == {"inner": Fraction(1, 2)}

    def test_yaml_roundtrip(self, tmp_path):
        from tpdm_tpu.utils.instantiate import instantiate_file

        p = tmp_path / "c.yaml"
        p.write_text("_target_: fractions.Fraction\nnumerator: 3\ndenominator: 4\n")
        from fractions import Fraction

        assert instantiate_file(str(p)) == Fraction(3, 4)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        import optax

        from tpdm_tpu.train import checkpoint as ckpt

        params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        rng = np.random.default_rng(0)
        rng.integers(0, 10, 5)

        path = ckpt.save_checkpoint(
            str(tmp_path), 7, {"params": params}, opt_state, episode=99,
            np_rng_state=rng.bit_generator.state,
        )
        assert ckpt.latest_checkpoint(str(tmp_path)) == path
        restored = ckpt.restore_checkpoint(
            path,
            {"params": jax.tree.map(jnp.zeros_like, params)},
            tx.init(jax.tree.map(jnp.zeros_like, params)),
        )
        np.testing.assert_allclose(
            np.asarray(restored["tpm_params"]["params"]["w"]), np.arange(6).reshape(2, 3)
        )
        assert restored["update"] == 7 and restored["episode"] == 99
        r2 = np.random.default_rng(123)
        r2.bit_generator.state = restored["np_rng_state"]
        assert (r2.integers(0, 10, 5) == rng.integers(0, 10, 5)).all()

    def test_latest_skips_incomplete_dirs(self, tmp_path):
        """A crash mid-save must never leave a dir that resume picks up:
        saves go through tmp-checkpoint-N + os.replace, and resolution
        skips checkpoint-N dirs missing state/meta files."""
        import optax

        from tpdm_tpu.train import checkpoint as ckpt

        params = {"w": jnp.ones((2,))}
        tx = optax.adam(1e-3)
        good = ckpt.save_checkpoint(str(tmp_path), 3, params, tx.init(params))
        # debris: higher-numbered but incomplete (pre-atomic-save crash shape)
        os.makedirs(tmp_path / "checkpoint-9")
        # debris: interrupted atomic save
        os.makedirs(tmp_path / "tmp-checkpoint-12")
        assert ckpt.latest_checkpoint(str(tmp_path)) == good
        # rotation sweeps the tmp debris even with no limit set
        pruned = ckpt.rotate_checkpoints(str(tmp_path), None)
        assert str(tmp_path / "tmp-checkpoint-12") in pruned
        assert not (tmp_path / "tmp-checkpoint-12").exists()
        assert (tmp_path / "checkpoint-3").exists()

    def test_resave_same_step_replaces(self, tmp_path):
        import optax

        from tpdm_tpu.train import checkpoint as ckpt

        tx = optax.adam(1e-3)
        p1 = {"w": jnp.ones((2,))}
        p2 = {"w": jnp.full((2,), 5.0)}
        ckpt.save_checkpoint(str(tmp_path), 4, p1, tx.init(p1))
        path = ckpt.save_checkpoint(str(tmp_path), 4, p2, tx.init(p2))
        restored = ckpt.restore_checkpoint(
            path, {"w": jnp.zeros((2,))}, tx.init({"w": jnp.zeros((2,))})
        )
        np.testing.assert_allclose(np.asarray(restored["tpm_params"]["w"]), 5.0)

    def test_tpm_safetensors_reference_layout(self, tmp_path):
        import optax

        from tpdm_tpu.models import TimePredictor
        from tpdm_tpu.train import checkpoint as ckpt

        tpm = TimePredictor(conv_out_channels=4, in_channels=8, temb_dim=6)
        params = tpm.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)), jnp.zeros((1, 6))
        )
        tx = optax.adam(1e-3)
        path = ckpt.save_checkpoint(str(tmp_path), 1, params, tx.init(params))
        restored = ckpt.load_tpm_safetensors(os.path.join(path, ckpt.TPM_FILE))
        for a, b in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(restored), key=str),
        ):
            np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-6)


class TestEvalCallback:
    def test_plots_and_history(self, tmp_path):
        from tpdm_tpu.train import RLOOConfig
        from tpdm_tpu.train.builders import build_toy_agent, build_toy_reward, make_prompt_encoder
        from tpdm_tpu.train.callbacks import EvalVisualizationCallback

        config = RLOOConfig(max_inference_steps=3, per_device_train_batch_size=2, rloo_k=2)
        agent = build_toy_agent(config)
        collate = make_prompt_encoder(agent)
        batch = collate([{"prompt": "a"}, {"prompt": "b"}])
        cb = EvalVisualizationCallback(
            batch, str(tmp_path), reward_fn=build_toy_reward(), eval_steps=2,
            max_inference_steps=4,
        )
        tpm_params = agent.init_tpm_params(jax.random.PRNGKey(0))

        class FakeTrainer:
            pass

        t = FakeTrainer()
        t.agent = agent
        cb.on_step_end(t, 1, {}, tpm_params)  # not an eval step
        assert cb.history == []
        cb.on_step_end(t, 2, {}, tpm_params)
        assert len(cb.history) == 1
        assert os.path.exists(tmp_path / "eval_curves_2.png")
        assert cb.history[0]["sigmas"].shape[1] == 4  # eval budget, not train
        # sampler config restored afterwards
        assert agent.sampler_cfg.max_inference_steps == 3


class TestEvalWandbPayload:
    def test_full_payload_parity(self, tmp_path, monkeypatch):
        """When a wandb run is active, the callback must send the reference's
        full payload (callbacks.py:99-154): scalars, NFE histogram,
        per-prompt schedule figures with captions, and the image strip."""
        import sys
        import types

        import numpy as np

        from tpdm_tpu.train.callbacks import EvalVisualizationCallback

        logged = {}

        fake = types.ModuleType("wandb")
        fake.run = object()
        fake.Histogram = lambda vals: ("hist", tuple(vals))
        fake.Image = lambda obj, caption=None: ("img", caption)
        fake.log = lambda payload, step=None: logged.update(
            payload, __step=step
        )
        monkeypatch.setitem(sys.modules, "wandb", fake)

        cb = EvalVisualizationCallback({}, str(tmp_path), sigma_filter=0.0)
        b, T = 3, 4
        rec = {
            "update": 7,
            "sigmas": np.linspace(1.0, 0.2, b * T).reshape(b, T),
            "alphas": np.full((b, T), 1.5),
            "betas": np.full((b, T), 2.5),
            "masks": np.zeros((b, T), bool),
            "nfe": np.array([3, 4, 2]),
            "rewards": np.array([0.1, 0.5, -0.2]),
        }
        imgs = np.zeros((b, 8, 8, 3), np.uint8)
        cb._maybe_wandb(rec, imgs=imgs, prompts=["p one", "p two", "p three"])

        assert logged["__step"] == 7
        assert logged["eval/mean_nfe"] == 3.0
        assert abs(logged["eval/mean_reward"] - rec["rewards"].mean()) < 1e-9
        assert logged["eval/nfe_hist"] == ("hist", (3, 4, 2))
        for i in range(b):
            kind, caption = logged[f"eval/curves/{i}"]
            assert kind == "img"
            assert caption.startswith(f"p ")
            assert f"nfe={int(rec['nfe'][i])}" in caption
            assert "reward=" in caption
        assert logged["eval/images"][0] == "img"

    def test_no_run_no_log(self, tmp_path, monkeypatch):
        import sys
        import types

        import numpy as np

        from tpdm_tpu.train.callbacks import EvalVisualizationCallback

        fake = types.ModuleType("wandb")
        fake.run = None
        fake.log = lambda *a, **k: (_ for _ in ()).throw(AssertionError)
        monkeypatch.setitem(sys.modules, "wandb", fake)
        cb = EvalVisualizationCallback({}, str(tmp_path))
        cb._maybe_wandb({"update": 1, "sigmas": np.zeros((1, 2)),
                         "alphas": np.zeros((1, 2)), "betas": np.zeros((1, 2)),
                         "nfe": np.array([1])})


class TestOrbaxBackend:
    def test_save_restore_sharded(self, tmp_path):
        from tpdm_tpu.train.checkpoint import restore_sharded, save_sharded

        tree = {
            "a": jnp.arange(12.0).reshape(3, 4),
            "nested": {"b": jnp.ones((2, 2), jnp.int32)},
        }
        p = str(tmp_path / "ckpt")
        save_sharded(p, tree)
        out = restore_sharded(p, jax.tree.map(jnp.zeros_like, tree))
        np.testing.assert_allclose(np.asarray(out["a"]), np.asarray(tree["a"]))
        np.testing.assert_array_equal(
            np.asarray(out["nested"]["b"]), np.asarray(tree["nested"]["b"])
        )


class TestCLIPTokenizer:
    @pytest.fixture
    def tok_dir(self, tmp_path):
        """Build a tiny real BPE vocab and check against transformers."""
        # construct a miniature but well-formed CLIP-style vocab
        byte_syms = []
        from tpdm_tpu.utils.tokenizer import _bytes_to_unicode

        b2u = _bytes_to_unicode()
        for ch in sorted(set(b2u.values())):
            byte_syms.append(ch)
        vocab = {}
        idx = 0
        for s in byte_syms:
            vocab[s] = idx; idx += 1
        for s in byte_syms:
            vocab[s + "</w>"] = idx; idx += 1
        merges = ["#version: 0.2"]
        for pair in [("h", "e"), ("l", "l"), ("he", "ll"), ("o</w>", None),
                     ("hell", "o</w>"), ("w", "o"), ("r", "l"), ("wo", "rl"),
                     ("worl", "d</w>"), ("c", "a"), ("ca", "t</w>")]:
            if pair[1] is None:
                continue
            merged = pair[0] + pair[1]
            if merged not in vocab:
                vocab[merged] = idx; idx += 1
            merges.append(f"{pair[0]} {pair[1]}")
        vocab["<|startoftext|>"] = idx; idx += 1
        vocab["<|endoftext|>"] = idx; idx += 1
        import json as _json

        d = tmp_path / "tok"
        d.mkdir()
        (d / "vocab.json").write_text(_json.dumps(vocab))
        (d / "merges.txt").write_text("\n".join(merges) + "\n")
        return str(d)

    def test_matches_transformers_cliptokenizer(self, tok_dir):
        from transformers import CLIPTokenizer as HFTok

        from tpdm_tpu.utils.tokenizer import CLIPTokenizer

        ours = CLIPTokenizer.from_pretrained(tok_dir)
        theirs = HFTok(
            vocab_file=f"{tok_dir}/vocab.json", merges_file=f"{tok_dir}/merges.txt"
        )
        for text in [
            "hello world", "a cat!", "Hello, WORLD  cat", "héllo",
            "hello_world", "snake_case cat", "!_!",
        ]:
            a = ours(text, max_length=16)["input_ids"][0].tolist()
            b = theirs(
                [text], padding="max_length", max_length=16, truncation=True
            )["input_ids"][0]
            assert a == b, (text, a, b)

    def test_truncation(self, tok_dir):
        from tpdm_tpu.utils.tokenizer import CLIPTokenizer

        ours = CLIPTokenizer.from_pretrained(tok_dir)
        ids = ours("hello " * 50, max_length=8)["input_ids"][0]
        assert len(ids) == 8
        assert ids[-1] == ours.eos


class TestEvalCallbackSD15:
    def test_callback_works_with_sd15_agent(self, tmp_path):
        """The callback must handle the SD1.5 agent's differing config/output
        field names (num_inference_steps, times)."""
        import jax.numpy as jnp

        from tpdm_tpu.models import TimePredictor
        from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
        from tpdm_tpu.train import RLOOConfig
        from tpdm_tpu.train.callbacks import EvalVisualizationCallback
        from tpdm_tpu.train.sd15_agent import SD15Agent

        cfg = UNetConfig.toy(cross_attention_dim=16)
        unet = UNetSD15(cfg)
        params = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 4, cfg.sample_size, cfg.sample_size)),
            jnp.ones((2,)),
            jnp.zeros((2, 5, 16)),
        )
        config = RLOOConfig(max_inference_steps=3)
        agent = SD15Agent(
            unet, params, config,
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * cfg.block_out_channels[0],
                temb_dim=cfg.block_out_channels[0],
            ),
        )
        batch = {
            "prompt_embeds": jnp.zeros((1, 5, 16)),
            "negative_prompt_embeds": jnp.zeros((1, 5, 16)),
        }
        cb = EvalVisualizationCallback(
            batch, str(tmp_path), eval_steps=1, max_inference_steps=4
        )
        tpm_params = agent.init_tpm_params(jax.random.PRNGKey(1))

        class T:
            pass

        t = T()
        t.agent = agent
        cb.on_step_end(t, 1, {}, tpm_params)
        assert len(cb.history) == 1
        assert cb.history[0]["sigmas"].shape[1] == 4  # eval budget applied


class TestBenchCPUFallback:
    def test_bench_prints_one_json_line(self):
        """Driver artifact: bench.py must never hard-fail off-TPU."""
        import json as _json
        import subprocess
        import sys as _sys

        proc = subprocess.run(
            [_sys.executable, "bench.py", "--cpu"],
            capture_output=True, text=True, timeout=900,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert len(lines) == 1
        payload = _json.loads(lines[0])
        for k in ("metric", "value", "unit", "vs_baseline"):
            assert k in payload


class TestNativeTarIndex:
    """tar_index.cpp vs Python tarfile on generated shards."""

    def _make_tar(self, path, fmt, n=5, longname=False):
        import io
        import json as _json
        import tarfile as _tf

        with _tf.open(path, "w", format=fmt) as tar:
            for i in range(n):
                name = f"{i:04d}.json"
                if longname and i == 2:
                    name = ("sub/" + "x" * 120) + f"/{i:04d}.json"
                payload = _json.dumps({"caption": f"cap {i}"}).encode()
                info = _tf.TarInfo(name=name)
                info.size = len(payload)
                tar.addfile(info, io.BytesIO(payload))

    def test_index_matches_tarfile_ustar(self, tmp_path):
        import tarfile as _tf

        from tpdm_tpu.data.native import tar_index

        p = tmp_path / "shard.tar"
        self._make_tar(str(p), _tf.USTAR_FORMAT)
        entries = tar_index(str(p))
        with _tf.open(p) as tar:
            ref = [(m.name, m.offset_data, m.size) for m in tar if m.isfile()]
        assert entries == ref

    def test_index_gnu_longname(self, tmp_path):
        import tarfile as _tf

        from tpdm_tpu.data.native import tar_index

        p = tmp_path / "shard_gnu.tar"
        self._make_tar(str(p), _tf.GNU_FORMAT, longname=True)
        entries = tar_index(str(p))
        with _tf.open(p) as tar:
            ref = [(m.name, m.offset_data, m.size) for m in tar if m.isfile()]
        assert entries == ref
        assert any(len(name) > 100 for name, _, _ in entries)

    def test_webdataset_native_fast_path(self, tmp_path):
        import tarfile as _tf

        from tpdm_tpu.data import WebDatasetPrompts

        p = tmp_path / "shard.tar"
        self._make_tar(str(p), _tf.USTAR_FORMAT)
        ds = WebDatasetPrompts(str(p), buffer_size=2)
        rows = list(ds._native_iter(str(p)))
        assert len(rows) == 5
        assert rows[0]["json"]["caption"] == "cap 0"
        # full iterator (shuffle buffer) sees the same rows
        keys = sorted(r["__key__"] for r in ds)
        assert keys == [f"{i:04d}" for i in range(5)]


class TestSetupDebug:
    def test_env_gate_off(self, monkeypatch):
        from tpdm_tpu.utils.debug import setup_debug_from_env

        monkeypatch.delenv("TPDM_DEBUG", raising=False)
        assert setup_debug_from_env() is False

    def test_missing_debugpy_is_nonfatal(self, monkeypatch):
        import sys

        from tpdm_tpu.utils import debug

        monkeypatch.setitem(sys.modules, "debugpy", None)
        monkeypatch.setenv("TPDM_DEBUG", "1")
        # import of a None module raises ImportError -> returns False
        assert debug.setup_debug_from_env() is False


class TestCompileCache:
    def test_resolution_order_and_jax_config(self, monkeypatch, tmp_path):
        import jax

        from tpdm_tpu.utils.cache import enable_compile_cache

        from tpdm_tpu.utils.cache import host_fingerprint

        fp = host_fingerprint()
        before = jax.config.jax_compilation_cache_dir
        try:
            monkeypatch.setenv("TPDM_COMPILE_CACHE", str(tmp_path / "env"))
            # explicit arg beats env; EVERY spelling gets the host
            # fingerprint (foreign-host caches must never be loadable)
            got = enable_compile_cache(str(tmp_path / "arg"))
            assert got == f"{tmp_path / 'arg'}-{fp}"
            assert jax.config.jax_compilation_cache_dir == got
            # env beats default
            assert enable_compile_cache() == f"{tmp_path / 'env'}-{fp}"
            # already-fingerprinted paths are not double-suffixed
            assert enable_compile_cache(got) == got
        finally:
            jax.config.update("jax_compilation_cache_dir", before)

    def test_default_when_nothing_set(self, monkeypatch):
        import jax

        from tpdm_tpu.utils.cache import (
            DEFAULT_CACHE_DIR,
            enable_compile_cache,
            host_fingerprint,
        )

        before = jax.config.jax_compilation_cache_dir
        try:
            monkeypatch.delenv("TPDM_COMPILE_CACHE", raising=False)
            monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
            # default is keyed by host ISA: a cache populated on a machine
            # with different vector features must never be loaded here
            got = enable_compile_cache()
            assert got == f"{DEFAULT_CACHE_DIR}-{host_fingerprint()}"
            assert len(host_fingerprint()) == 12
        finally:
            jax.config.update("jax_compilation_cache_dir", before)

    def test_fingerprint_discriminates_xla_tuning_flags(self, monkeypatch):
        """AOT artifacts built under different XLA tuning flags load from
        a cpuinfo-keyed cache and flood cpu_aot_loader.cc SIGILL warnings
        (observed 2026-08-19 with +prefer-no-scatter mismatch). The
        fingerprint must fold in the flag identity so a foreign-flag
        cache is a different directory, not a toxic hit."""
        from tpdm_tpu.utils.cache import host_fingerprint

        raw = host_fingerprint.__wrapped__  # bypass the lru_cache
        base_flags = os.environ.get("XLA_FLAGS", "")
        monkeypatch.setenv(
            "XLA_FLAGS", (base_flags + " --xla_cpu_prefer_no_scatter").strip()
        )
        foreign = raw()
        monkeypatch.setenv("XLA_FLAGS", base_flags)
        ours = raw()
        assert foreign != ours
        # pure flag reordering is NOT a cache miss
        parts = base_flags.split()
        if len(parts) >= 2:
            monkeypatch.setenv("XLA_FLAGS", " ".join(reversed(parts)))
            assert raw() == ours
        # libtpu init args and jax version changes also miss
        monkeypatch.setenv("LIBTPU_INIT_ARGS", "--foo=1")
        assert raw() != ours
