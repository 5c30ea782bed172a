"""Component builders wired from YAML configs (see configs/*).

The reference instantiates its swappable components from `_target_` YAMLs
(reference: main_diff_rloo_trainer.py:28-43); these builders are the
targets on our side: agents (toy or pretrained SD3), reward functions, and
the glue that adapts reward models to the trainer's
`reward_fn(prompts, outputs) -> (scores, last_image_scores)` protocol.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
from tpdm_tpu.train.config import RLOOConfig
from tpdm_tpu.train.rloo import TPDMAgent

logger = logging.getLogger(__name__)


def build_toy_agent(
    config: RLOOConfig, seed: int = 0, n_txt: int = 8
) -> TPDMAgent:
    """Random-weight toy agent: runs anywhere, for smoke training."""
    mcfg = MMDiTConfig.toy()
    model = MMDiT(mcfg)
    key = jax.random.PRNGKey(seed)
    params = model.init(
        key,
        jnp.zeros((2, mcfg.in_channels, mcfg.sample_size, mcfg.sample_size)),
        jnp.ones((2,)),
        jnp.zeros((2, n_txt, mcfg.joint_attention_dim)),
        jnp.zeros((2, mcfg.pooled_projection_dim)),
    )
    return TPDMAgent(
        model,
        params,
        config,
        tpm=TimePredictor(
            conv_out_channels=4,
            in_channels=2 * mcfg.inner_dim,
            temb_dim=mcfg.inner_dim,
            init_alpha=config.init_alpha,
            init_beta=config.init_beta,
        ),
    )


def build_sd3_agent(
    config: RLOOConfig,
    pretrained: str,
    tpm_checkpoint: Optional[str] = None,
    dtype: str = "bfloat16",
    variant: str = "sd3_medium",
) -> TPDMAgent:
    """Agent over a pretrained SD3 checkpoint directory (diffusers layout)."""
    from tpdm_tpu.pipeline.pipeline import load_pipeline_from_pretrained

    jdtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype]
    mcfg = getattr(MMDiTConfig, variant)(dtype=jdtype)
    pipe = load_pipeline_from_pretrained(
        pretrained,
        dtype=jdtype,
        load_text_encoders=False,
        tpm_checkpoint=tpm_checkpoint,
        mmdit_config=mcfg,
    )
    agent = TPDMAgent(pipe.mmdit, pipe.mmdit_params, config, tpm=pipe.tpm)
    agent._pretrained_tpm_params = pipe.tpm_params
    return agent


def build_toy_reward() -> Callable:
    """Deterministic latent-statistic reward for smoke runs."""

    def reward_fn(prompts, outputs):
        s = np.asarray(
            jnp.tanh(jnp.mean(outputs.final_latents, axis=(1, 2, 3)))
        ).astype(np.float32)
        return s, s

    return reward_fn


def build_toy_draft_reward() -> Callable:
    """Differentiable latent-mean reward for `--trainer draft` smoke runs
    (DraftTrainer's reward_apply contract: (images, batch) -> (b,) scores
    with gradients; see train/draft.py build_image_reward_grad_apply for
    the real ImageReward version)."""
    import jax.numpy as jnp

    def reward_apply(images, batch):
        return jnp.mean(images, axis=(1, 2, 3))

    return reward_apply


def build_image_reward_fn(
    vae_pretrained: Optional[str] = None,
    reward_checkpoint: Optional[str] = None,
    tokenizer_path: Optional[str] = None,
    max_length: int = 35,
    vae_config: str = "sd3",
    vae_params=None,
    reward_model=None,
) -> Callable:
    """ImageReward-based reward: decode final latents -> preprocess ->
    BLIP score (reference reward path, modeling_sd3_pnt.py:828-842, with
    batched scoring instead of the per-sample loop).

    ``vae_config``/``vae_params`` allow injecting a toy VAE for smoke runs
    and tests; the decode always routes through the production fast path
    (`models.vae.make_fast_decode`, bf16 + fp32-GN — the configuration
    bench.py measures).
    """
    from tpdm_tpu.models.vae import VAE, VAEConfig, make_fast_decode
    from tpdm_tpu.rewards.image_reward import ImageRewardModel, convert_image_reward
    from tpdm_tpu.utils import convert as C
    from tpdm_tpu.utils.image import postprocess_images

    vcfg = getattr(VAEConfig, vae_config)()
    vae = VAE(vcfg)
    if vae_params is None:
        if vae_pretrained is None:
            raise ValueError("image reward needs vae_pretrained for decoding")
        import os

        sd = {}
        for f in sorted(os.listdir(os.path.join(vae_pretrained, "vae"))):
            if f.endswith(".safetensors"):
                sd.update(C.load_safetensors(os.path.join(vae_pretrained, "vae", f)))
        vae_params = C.convert_vae(sd)

    if reward_model is not None:
        model = reward_model
    elif reward_checkpoint is not None:
        params = convert_image_reward(C.load_safetensors(reward_checkpoint))
        model = ImageRewardModel.create(params=params)
    else:
        model = ImageRewardModel.create()
        logger.warning("ImageReward running with RANDOM weights (no checkpoint)")

    if tokenizer_path is None:
        raise ValueError("image reward needs a BERT vocab.txt path")
    # Native WordPiece (reference loads transformers' BertTokenizer,
    # ImageReward.py:111-112; ours is transformers-free at runtime)
    from tpdm_tpu.utils.bert_tokenizer import BertTokenizer

    tokenizer = BertTokenizer.from_pretrained(tokenizer_path)

    # bf16 fast decode — same code path as bench.py (~102 ms vs the 475 ms
    # fp32 configuration; this sits on the rollout critical path once per
    # update)
    decode, vae_params = make_fast_decode(vae, vae_params)

    def reward_fn(prompts, outputs):
        images = postprocess_images(decode(vae_params, outputs.final_latents))
        enc = tokenizer(
            list(prompts),
            padding="max_length",
            truncation=True,
            max_length=max_length,
            return_tensors="np",
        )
        scores = model.score(
            enc["input_ids"], images, text_mask=enc["attention_mask"].astype(bool)
        )
        return scores.astype(np.float32), scores.astype(np.float32)

    return reward_fn


def build_inference_ranker(
    reward_checkpoint: Optional[str] = None,
    tokenizer_path: Optional[str] = None,
    max_length: int = 35,
    reward_model=None,
    tokenizer=None,
) -> Callable:
    """Best-of-N candidate ranker for serving: ``(prompt, images_uint8
    (k,H,W,3)) -> (ranking, rewards)`` via ImageReward.inference_rank
    (reference: src/reward_models/ImageReward/ImageReward.py:144-183).

    ``reward_model``/``tokenizer`` allow injecting toy towers and a stub
    tokenizer for tests and the toy server; production passes a converted
    ImageReward safetensors + BERT vocab.txt (native WordPiece, zero
    runtime transformers).
    """
    from tpdm_tpu.rewards.image_reward import ImageRewardModel, convert_image_reward
    from tpdm_tpu.utils import convert as C

    if reward_model is None:
        if reward_checkpoint is not None:
            params = convert_image_reward(C.load_safetensors(reward_checkpoint))
            reward_model = ImageRewardModel.create(params=params)
        else:
            reward_model = ImageRewardModel.create()
            logger.warning("ImageReward ranker running with RANDOM weights")
    if tokenizer is None:
        if tokenizer_path is None:
            raise ValueError("ranker needs a BERT vocab.txt path")
        from tpdm_tpu.utils.bert_tokenizer import BertTokenizer

        tokenizer = BertTokenizer.from_pretrained(tokenizer_path)

    def ranker(prompt: str, images):
        enc = tokenizer(
            [prompt],
            padding="max_length",
            truncation=True,
            max_length=max_length,
            return_tensors="np",
        )
        return reward_model.inference_rank(
            enc["input_ids"][0],
            images,
            text_mask=enc["attention_mask"][0].astype(bool),
        )

    return ranker


def make_prompt_encoder(
    agent: TPDMAgent, n_txt: int = 8, seed: int = 1234
) -> Callable:
    """Hash-based deterministic prompt embedder for toy agents (no text
    towers): every distinct prompt maps to a fixed random embedding."""
    import hashlib

    mcfg = agent.mmdit.config

    def collate_with_embeds(rows):
        from tpdm_tpu.data.collate import json_prompt_collate

        batch = json_prompt_collate(rows)
        pe, pp = [], []
        for p in batch["prompt"]:
            # stable across processes/runs (builtin hash() is salted)
            digest = hashlib.md5(f"{p}|{seed}".encode()).digest()
            k = jax.random.PRNGKey(int.from_bytes(digest[:4], "little"))
            k1, k2 = jax.random.split(k)
            pe.append(
                jax.random.normal(k1, (n_txt, mcfg.joint_attention_dim))
            )
            pp.append(jax.random.normal(k2, (mcfg.pooled_projection_dim,)))
        batch["prompt_embeds"] = jnp.stack(pe)
        batch["pooled_prompt_embeds"] = jnp.stack(pp)
        batch["negative_prompt_embeds"] = jnp.zeros_like(batch["prompt_embeds"])
        batch["negative_pooled_prompt_embeds"] = jnp.zeros_like(
            batch["pooled_prompt_embeds"]
        )
        return batch

    return collate_with_embeds
