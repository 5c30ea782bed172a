"""End-to-end smoke of the two runnable entry points as SUBPROCESSES —
the L6 surface a reference user actually launches (reference:
main_diff_rloo_trainer.py via scripts/launch_sd3_train.sh:10).

Everything else in the suite drives the library API; this is the only
place the CLI arg-parsing + YAML component resolution + trainer wiring is
exercised exactly as shipped.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, **env_extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
    return subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=900
    )


class TestMainTrainCLI:
    def test_toy_training_run_saves_and_resumes(self, tmp_path):
        out = str(tmp_path)
        cmd = [
            # --cpu is load-bearing: the session env pins the TPU plugin
            # regardless of JAX_PLATFORMS (see CLAUDE.md), and a toy smoke
            # must not compile on a shared real chip
            sys.executable, "main_train.py", "--cpu",
            "--model_config", "configs/models/toy_agent.yaml",
            "--reward_model_config", "configs/models/toy_reward.yaml",
            "--train_dataset", "configs/datasets/jsonl_prompts.yaml",
            # no --data_collator: the toy agent path wraps the default
            # collator with the hash-embed prompt encoder (README quick-start)
            "--total_episodes", "16", "--per_device_train_batch_size", "4",
            "--rloo_k", "2", "--max_inference_steps", "3",
            "--save_steps", "2", "--logging_steps", "1",
            "--output_dir", out,
        ]
        r = _run(cmd)
        assert r.returncode == 0, r.stderr[-2000:]
        # 16 episodes / batch 4 = 4 updates; boundaries at 2 and 4
        assert (tmp_path / "checkpoint-2").is_dir()
        assert (tmp_path / "checkpoint-4" / "tpm.safetensors").exists()
        rows = [
            json.loads(l)
            for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
        ]
        assert [row["update"] for row in rows] == [1, 2, 3, 4]
        assert all("policy/steps_avg" in row for row in rows)

        # resume dispatch parity (main_diff_rloo_trainer.py:60-69): 'true'
        # resolves the latest checkpoint; run is already complete, so the
        # trainer starts past the horizon and exits immediately
        r2 = _run(cmd + ["--resume_from_checkpoint", "true"])
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "resumed from" in (r2.stderr + r2.stdout)

    def test_trainer_draft_mode(self, tmp_path):
        """--trainer draft: reward-gradient LoRA fine-tuning through the
        same CLI stack (YAML components, shared optimization flags); must
        write the LoRA safetensors and TensorBoard events and report an
        un-skipped final reward."""
        out = str(tmp_path)
        cmd = [
            sys.executable, "main_train.py", "--cpu", "--trainer", "draft",
            "--model_config", "configs/models/toy_agent.yaml",
            "--reward_model_config", "configs/models/toy_draft_reward.yaml",
            "--train_dataset", "configs/datasets/jsonl_prompts.yaml",
            "--draft_updates", "2", "--per_device_train_batch_size", "2",
            "--max_inference_steps", "3", "--learning_rate", "5e-3",
            "--lora_rank", "2", "--save_steps", "2",
            "--report_to", "tensorboard", "--output_dir", out,
        ]
        r = _run(cmd)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "draft training done" in (r.stderr + r.stdout)
        from tpdm_tpu.train.draft import load_lora

        lora = load_lora(str(tmp_path / "lora-2.safetensors"))
        assert lora  # trained factors round-trip
        import glob

        from tpdm_tpu.utils.tb_writer import read_scalar_events

        files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
        rows = read_scalar_events(files[0])
        assert [s for s, _ in rows] == [1, 2]
        assert "draft/reward" in rows[-1][1]

    def test_trainer_dpo_mode(self, tmp_path):
        """--trainer dpo: Diffusion-DPO preference-pair LoRA fine-tuning —
        no reward YAML; the pair dataset IS the supervision. Must write
        the rotated LoRA safetensors and log a positive final margin."""
        out = str(tmp_path)
        cmd = [
            sys.executable, "main_train.py", "--cpu", "--trainer", "dpo",
            "--model_config", "configs/models/toy_agent.yaml",
            "--train_dataset", "configs/datasets/toy_preference_pairs.yaml",
            "--draft_updates", "3", "--per_device_train_batch_size", "2",
            "--learning_rate", "5e-3", "--lora_rank", "2",
            "--dpo_beta", "100", "--save_steps", "1",
            "--save_total_limit", "2", "--output_dir", out,
        ]
        r = _run(cmd)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "dpo training done" in (r.stderr + r.stdout)
        import glob as _glob

        files = sorted(
            os.path.basename(p)
            for p in _glob.glob(str(tmp_path / "lora-*.safetensors"))
        )
        assert files == ["lora-2.safetensors", "lora-3.safetensors"]
        from tpdm_tpu.train.draft import load_lora

        assert load_lora(str(tmp_path / "lora-3.safetensors"))

    def test_trainer_distill_mode(self, tmp_path):
        """--trainer distill: LCM-LoRA consistency distillation — no
        reward YAML (the teacher supervises itself). Must write the LoRA
        safetensors and report a finite final loss."""
        out = str(tmp_path)
        cmd = [
            sys.executable, "main_train.py", "--cpu", "--trainer", "distill",
            "--model_config", "configs/models/toy_agent.yaml",
            "--train_dataset", "configs/datasets/jsonl_prompts.yaml",
            "--draft_updates", "2", "--per_device_train_batch_size", "2",
            "--max_inference_steps", "3", "--learning_rate", "5e-3",
            "--lora_rank", "2", "--save_steps", "2", "--output_dir", out,
        ]
        r = _run(cmd)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "distill training done" in (r.stderr + r.stdout)
        from tpdm_tpu.train.draft import load_lora

        assert load_lora(str(tmp_path / "lora-2.safetensors"))

    def test_dpo_rejects_missing_reward_only_for_rloo_draft(self, tmp_path):
        """rloo/draft without --reward_model_config must exit with an
        actionable message (dpo legitimately runs without one)."""
        cmd = [
            sys.executable, "main_train.py", "--cpu",
            "--model_config", "configs/models/toy_agent.yaml",
            "--train_dataset", "configs/datasets/jsonl_prompts.yaml",
            "--output_dir", str(tmp_path),
        ]
        r = _run(cmd)
        assert r.returncode != 0
        assert "requires --reward_model_config" in (r.stderr + r.stdout)

    def test_prompts_only_collator_fails_with_guidance(self, tmp_path):
        """An embeds-less collator with an embeds-consuming agent must fail
        fast with an actionable message, not a bare KeyError."""
        cmd = [
            sys.executable, "main_train.py", "--cpu",
            "--model_config", "configs/models/toy_agent.yaml",
            "--reward_model_config", "configs/models/toy_reward.yaml",
            "--train_dataset", "configs/datasets/jsonl_prompts.yaml",
            "--data_collator", "configs/collators/json_prompt.yaml",
            "--total_episodes", "4", "--per_device_train_batch_size", "4",
            "--rloo_k", "2", "--max_inference_steps", "3",
            "--output_dir", str(tmp_path),
        ]
        r = _run(cmd)
        assert r.returncode != 0
        assert "prompt_embeds" in r.stderr and "make_prompt_encoder" in r.stderr


class TestLaunchScript:
    def test_paper_recipe_launch_script(self, tmp_path):
        """scripts/launch_sd3_train.sh: the reference launch analogue
        (launch_sd3_train.sh:16-40 recipe) runs end-to-end, including the
        --resume_from_checkpoint false contract (regression: the string
        "false" was treated as a checkpoint path)."""
        env = dict(
            os.environ, JAX_PLATFORMS="cpu",
            OUTPUT_DIR=str(tmp_path), MESH="auto",
        )
        r = subprocess.run(
            ["bash", "scripts/launch_sd3_train.sh", "--cpu",
             "--total_episodes", "16", "--max_inference_steps", "3",
             "--save_steps", "1000"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "training done:" in r.stderr
        # paper recipe: kl_coef=0 -> no KL penalty in the reward
        assert "'objective/non_score_reward': 0.0" in r.stderr
