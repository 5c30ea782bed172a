"""Checkpoint save/resume for RLOO training.

Layout parity with the reference's HF-Trainer machinery (reference:
src/train/rloo_trainer.py:299-321,598-611): numbered `checkpoint-N`
directories containing the trainer state (TPM params + optimizer state +
counters + host RNG), with `latest_checkpoint` resolution, plus the
TPM-only safetensors export in the `agent_model.`-prefixed layout that the
reference's inference stack loads (gradio_sd3_inference.py:20-21).

Serialization is flax msgpack (single small file — the trainable state is
~7M params); the frozen towers are never checkpointed, they are loaded from
their original pretrained artifacts.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

STATE_FILE = "trainer_state.msgpack"
META_FILE = "trainer_meta.json"
TPM_FILE = "tpm.safetensors"
EMA_FILE = "ema.msgpack"  # optional: EMA of tpm_params (RLOOConfig.ema_decay)


def save_checkpoint(
    output_dir: str,
    step: int,
    tpm_params: Any,
    opt_state: Any,
    episode: int = 0,
    np_rng_state: Optional[dict] = None,
    export_tpm_safetensors: bool = True,
    ema_params: Any = None,
) -> str:
    final = os.path.join(output_dir, f"checkpoint-{step}")
    # Crash-atomic: everything is written into a tmp dir that the
    # `checkpoint-(\d+)` resolution regex can never match, then renamed
    # into place in one os.replace. A kill mid-save leaves only
    # `tmp-checkpoint-N` debris, never a resumable-looking half checkpoint
    # (the reference inherits the same hazard from HF save_pretrained).
    path = os.path.join(output_dir, f"tmp-checkpoint-{step}")
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(path)

    state = {"tpm_params": tpm_params, "opt_state": opt_state}
    with open(os.path.join(path, STATE_FILE), "wb") as f:
        f.write(serialization.to_bytes(state))
    if ema_params is not None:
        # separate file keeps STATE_FILE's template stable for old resumes
        with open(os.path.join(path, EMA_FILE), "wb") as f:
            f.write(serialization.to_bytes(ema_params))
    meta = {"update": step, "episode": episode}
    if np_rng_state is not None:
        meta["np_rng_state"] = _encode_rng(np_rng_state)
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(meta, f)

    if export_tpm_safetensors:
        from safetensors.numpy import save_file

        from tpdm_tpu.utils.convert import export_tpm

        try:
            sd = {k: np.asarray(v) for k, v in export_tpm(tpm_params).items()}
        except (KeyError, TypeError):
            sd = None  # not a TimePredictor tree; skip interchange export
        if sd is not None:
            save_file(sd, os.path.join(path, TPM_FILE))

    if os.path.isdir(final):
        import shutil

        shutil.rmtree(final)  # re-saving the same step replaces it
    os.replace(path, final)
    return final


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Newest complete `checkpoint-N` dir (HF get_last_checkpoint analogue,
    rloo_trainer.py:301-304). Dirs missing the state or meta file — debris
    from pre-atomic-save crashes or foreign layouts — are skipped rather
    than handed to resume to crash on."""
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if not m or int(m.group(1)) <= best_step:
            continue
        path = os.path.join(output_dir, name)
        if not (
            os.path.exists(os.path.join(path, STATE_FILE))
            and os.path.exists(os.path.join(path, META_FILE))
        ):
            continue
        best, best_step = path, int(m.group(1))
    return best


def restore_checkpoint(path: str, tpm_params_template: Any, opt_state_template: Any) -> dict:
    """Returns the resume_state dict RLOOTrainer.train consumes."""
    with open(os.path.join(path, STATE_FILE), "rb") as f:
        state = serialization.from_bytes(
            {"tpm_params": tpm_params_template, "opt_state": opt_state_template},
            f.read(),
        )
    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    out = {
        "tpm_params": state["tpm_params"],
        "opt_state": state["opt_state"],
        "update": meta["update"],
        "episode": meta.get("episode", 0),
    }
    if "np_rng_state" in meta:
        out["np_rng_state"] = _decode_rng(meta["np_rng_state"])
    ema_path = os.path.join(path, EMA_FILE)
    if os.path.exists(ema_path):
        with open(ema_path, "rb") as f:
            out["ema_params"] = serialization.from_bytes(
                tpm_params_template, f.read()
            )
    return out


def rotate_checkpoints(output_dir: str, save_total_limit: Optional[int]) -> list:
    """Prune oldest `checkpoint-N` dirs beyond save_total_limit (newest by
    step number kept). HF-Trainer `_rotate_checkpoints` analogue — the
    reference inherits the flag via TrainingArguments. Returns pruned paths."""
    import shutil

    pruned_tmp = []
    if os.path.isdir(output_dir):
        for name in os.listdir(output_dir):
            # debris from a save interrupted mid-write (see save_checkpoint)
            if re.fullmatch(r"tmp-checkpoint-(\d+)", name):
                p = os.path.join(output_dir, name)
                shutil.rmtree(p, ignore_errors=True)
                pruned_tmp.append(p)
    if not save_total_limit or save_total_limit < 1:
        return pruned_tmp
    found = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            found.append((int(m.group(1)), os.path.join(output_dir, name)))
    found.sort()
    pruned = []
    for _, path in found[: max(0, len(found) - save_total_limit)]:
        shutil.rmtree(path, ignore_errors=True)
        pruned.append(path)
    return pruned_tmp + pruned


def load_tpm_safetensors(path: str) -> dict:
    """Load a TPM-only safetensors checkpoint (ours or the reference's)."""
    from tpdm_tpu.utils.convert import convert_tpm, load_safetensors

    return convert_tpm(load_safetensors(path))


def _encode_rng(state: dict) -> dict:
    def enc(v):
        if isinstance(v, np.ndarray):
            return {"__nd__": v.tolist(), "dtype": str(v.dtype)}
        if isinstance(v, dict):
            return {k: enc(x) for k, x in v.items()}
        return v

    return enc(state)


def _decode_rng(state: dict):
    def dec(v):
        if isinstance(v, dict) and "__nd__" in v:
            return np.array(v["__nd__"], dtype=v["dtype"])
        if isinstance(v, dict):
            return {k: dec(x) for k, x in v.items()}
        return v

    return dec(state)


# ---------------------------------------------------------------------------
# Orbax backend for large / sharded state (multi-host, GSPMD-sharded trees).
# The msgpack path above covers the small trainable state; use these when
# checkpointing sharded frozen-tower or optimizer shards across hosts.
# ---------------------------------------------------------------------------


def save_sharded(path: str, tree: Any) -> None:
    """Write a (possibly sharded) pytree with orbax StandardCheckpointer."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)


def restore_sharded(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_sharded; `template` supplies
    structure/sharding (abstract arrays allowed)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
