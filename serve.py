"""Inference demo server — the tpdm_tpu analogue of gradio_sd3_inference.py.

Loads a pretrained SD3 pipeline + TPM checkpoint and serves adaptive-
schedule generation (reference: gradio_sd3_inference.py:18-84: predict=True,
max 35 steps, reports realized step count). Uses gradio when importable,
otherwise a dependency-free stdlib HTTP server with the same API; --cli
generates once and writes a PNG.

    python serve.py --pretrained <sd3-dir> --tpm checkpoint/sd3/model.safetensors
    python serve.py --toy --cli --prompt "a cat"        # runs anywhere
"""

import argparse
import base64
import io
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("serve")


def _quant_on(args) -> bool:
    """--int8 / --int4: stored-quantized backbone weights."""
    if getattr(args, "int8", False) and getattr(args, "int4", False):
        raise SystemExit("--int8 and --int4 are mutually exclusive")
    return getattr(args, "int8", False) or getattr(args, "int4", False)


def _quant_bits(args) -> int:
    return 4 if getattr(args, "int4", False) else 8


_IMAGE_FORMATS = ("png", "jpeg")


def _check_format(fmt) -> str:
    """Per-request response image format. PNG (default) is lossless but
    costs ~180 ms/image encode at 1024px on one core; JPEG q92 encodes in
    ~10 ms at a third of the bytes — the right default for latency-
    sensitive clients."""
    if fmt is None:
        return "png"
    if not isinstance(fmt, str) or fmt.lower() not in _IMAGE_FORMATS:
        raise ValueError(f"format must be one of {_IMAGE_FORMATS}")
    return fmt.lower()


def _encode_image(image, fmt: str):
    """uint8 (H, W, 3) -> (payload key, base64 string)."""
    from PIL import Image

    buf = io.BytesIO()
    if fmt == "jpeg":
        Image.fromarray(image).save(buf, format="JPEG", quality=92)
    else:
        Image.fromarray(image).save(buf, format="PNG")
    return f"image_{fmt}_base64", base64.b64encode(buf.getvalue()).decode()


def build_pipeline(args):
    import jax

    if args.cpu and "axon" in str(jax.config.jax_platforms):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if args.toy:
        import numpy as np

        from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
        from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from tpdm_tpu.models.t5 import T5Config, T5Encoder
        from tpdm_tpu.models.vae import VAE, VAEConfig
        from tpdm_tpu.pipeline.pipeline import TPDMPipeline
        from tpdm_tpu.pipeline.text_encoding import SD3TextEncoders

        key = jax.random.PRNGKey(0)
        lcfg = CLIPTextConfig.toy(hidden_size=32, projection_dim=24)
        gcfg = CLIPTextConfig.toy(hidden_size=48, projection_dim=40)
        tcfg = T5Config.toy(
            d_model=96, quant_matmuls=getattr(args, "quant_text", False),
            quant_bits=_quant_bits(args),
        )
        clip_l, clip_g, t5 = CLIPTextModel(lcfg), CLIPTextModel(gcfg), T5Encoder(tcfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        t5_params = t5.init(key, jnp.zeros((1, 12), jnp.int32))
        if tcfg.quant_matmuls:
            from tpdm_tpu.ops.quant import prequantize_params

            t5_params = prequantize_params(t5_params)
        text = SD3TextEncoders(
            clip_l, clip_l.init(key, ids), clip_g, clip_g.init(key, ids),
            t5, t5_params, t5_width=96,
        )
        mcfg = MMDiTConfig.toy(
            joint_attention_dim=96, pooled_projection_dim=64,
            quant_matmuls=_quant_on(args), quant_bits=_quant_bits(args),
            # the 2-layer toy can cache only its front block — makes
            # --cache_interval (and its composition with
            # --guidance_interval) exercisable from the CLI
            cache_front_blocks=1,
        )
        mmdit = MMDiT(mcfg)
        mparams = mmdit.init(
            key, jnp.zeros((2, 16, 8, 8)), jnp.ones((2,)),
            jnp.zeros((2, 20, 96)), jnp.zeros((2, 64)),
        )
        if mcfg.quant_matmuls:
            from tpdm_tpu.ops.quant import prequantize_params

            mparams = prequantize_params(mparams)
        tpm = TimePredictor(
            conv_out_channels=4, in_channels=2 * mcfg.inner_dim,
            temb_dim=mcfg.inner_dim, init_alpha=0.5, init_beta=2.0,
        )
        tpm_params = tpm.init(
            key, jnp.zeros((2, 2 * mcfg.inner_dim, 4, 4)), jnp.zeros((2, mcfg.inner_dim))
        )
        vae = VAE(VAEConfig.toy(latent_channels=16))
        vparams = vae.init(key, jnp.zeros((1, 16, 8, 8)), jnp.zeros((1, 3, 16, 16)))
        pipe = TPDMPipeline(mmdit, mparams, tpm, tpm_params, vae, vparams, text)

        def tokenize(prompt, n=8):
            ids = [97] + [abs(hash(w)) % 90 + 1 for w in prompt.split()[:6]] + [98]
            ids = ids[:n] + [0] * (n - len(ids))
            return np.array([ids], np.int32), np.ones((1, 12), np.int32)

        return _apply_cli_lora(pipe, args), tokenize

    from tpdm_tpu.pipeline.pipeline import load_pipeline_from_pretrained

    pipe = load_pipeline_from_pretrained(
        args.pretrained, tpm_checkpoint=args.tpm, load_text_encoders=True,
        quant_int8=_quant_on(args), quant_bits=_quant_bits(args),
        quant_text=getattr(args, "quant_text", False),
    )

    # Native tokenizers (pure Python, no transformers at runtime); fall back
    # to transformers only if the checkpoint layout is unexpected.
    try:
        from tpdm_tpu.utils.t5_tokenizer import T5Tokenizer
        from tpdm_tpu.utils.tokenizer import CLIPTokenizer

        tok_clip = CLIPTokenizer.from_pretrained(
            os.path.join(args.pretrained, "tokenizer")
        )
        tok_t5 = T5Tokenizer.from_pretrained(
            os.path.join(args.pretrained, "tokenizer_3")
        )
    except Exception as e:  # any native load failure -> transformers fallback
        logger.warning("native tokenizer load failed (%s); using transformers", e)
        from transformers import CLIPTokenizer, T5TokenizerFast

        tok_clip = CLIPTokenizer.from_pretrained(
            args.pretrained, subfolder="tokenizer"
        )
        tok_t5 = T5TokenizerFast.from_pretrained(
            args.pretrained, subfolder="tokenizer_3"
        )

    def tokenize(prompt, _n=None):
        c = tok_clip(
            [prompt], padding="max_length", max_length=77, truncation=True,
            return_tensors="np",
        )["input_ids"]
        t = tok_t5(
            [prompt], padding="max_length", max_length=256, truncation=True,
            return_tensors="np",
        )["input_ids"]
        return c, t

    return _apply_cli_lora(pipe, args), tokenize


def _split_lora_args(args):
    """--lora entries -> (merge_path | None, [(name, path), ...]).

    A bare PATH merges at load (legacy single-adapter mode); NAME=PATH
    entries register multi-tenant adapters on the engine. Mixing the two,
    or passing more than one bare path, is operator error — fail loudly."""
    entries = getattr(args, "lora", None) or []
    if isinstance(entries, str):  # tests pass a plain string Namespace
        entries = [entries]
    merge, named = [], []
    for e in entries:
        name, sep, path = e.partition("=")
        if sep and name and "/" not in name:
            named.append((name, path))
        else:
            merge.append(e)
    if merge and named:
        raise SystemExit(
            "--lora: mix of bare-path (merge at load) and NAME=PATH "
            "(registered adapter) entries; pick one mode"
        )
    if len(merge) > 1:
        raise SystemExit(
            "--lora: multiple bare paths; to serve several adapters use "
            "NAME=PATH entries"
        )
    dup = {n for n, _ in named if sum(1 for m, _ in named if m == n) > 1}
    if dup:
        raise SystemExit(f"--lora: duplicate adapter names {sorted(dup)}")
    return (merge[0] if merge else None), named


def _merge_family_lora(agent, attr: str, args, family: str):
    """--lora for a family agent (sd15/sdxl/flux): a bare path merges
    DRaFT/DPO-trained factors (train/draft.py, train/dpo.py) into the
    frozen backbone at load; NAME=PATH adapters need --continuous
    --lora_fused (per-slot fused deltas on the family continuous
    engine)."""
    if not getattr(args, "lora", None):
        return
    lora_path, named = _split_lora_args(args)
    if named:
        if not (
            getattr(args, "lora_fused", False)
            and getattr(args, "continuous", False)
        ):
            raise SystemExit(
                f"--family {family} NAME=PATH adapters need --continuous "
                "--lora_fused (per-slot fused deltas; family engines have "
                "no merged-tree multiplex path); a bare path merges a "
                "single adapter at load"
            )
        return  # registered on the continuous engine in make_http_server
    import jax

    from tpdm_tpu.models.lora import apply_lora
    from tpdm_tpu.train.draft import load_lora

    lora = load_lora(lora_path)
    params = getattr(agent, attr)
    # apply_lora silently skips unmatched keys — never serve base weights
    # while the operator believes an adapter is live (fail-loud
    # convention, same as the quant guards)
    paths = set()
    jax.tree_util.tree_map_with_path(
        lambda p, _l: paths.add(
            "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in p
            )
        ),
        params,
    )
    missing = sorted(set(lora) - paths)
    if missing:
        raise ValueError(
            f"--lora {lora_path}: {len(missing)}/{len(lora)} factor keys "
            f"match nothing in the {family} backbone (e.g. {missing[0]!r}) "
            "— wrong family's adapter?"
        )
    setattr(
        agent, attr,
        apply_lora(params, lora, scale=getattr(args, "lora_scale", 1.0)),
    )
    logger.info(
        "merged LoRA %s into the %s backbone (%d kernels)",
        lora_path, family, len(lora),
    )


def _apply_cli_lora(pipe, args):
    """--lora PATH: merge DRaFT-trained factors (train/draft.py) into the
    backbone weights before any jit — the serving engines see one plain
    merged tree, so every engine mode (continuous, --dp, --mesh, quant)
    works unchanged. NAME=PATH entries are handled later, by
    engine.register_adapter (make_http_server)."""
    path, _named = _split_lora_args(args)
    if not path:
        return pipe
    if _quant_on(args):
        # stored-int kernels replace the dense "kernel" leaves, so the
        # factors have nothing to merge into — quantize AFTER merging
        # (fit_quant_params on a merged checkpoint) instead
        raise SystemExit(
            "--lora cannot merge into a quantized (--int8/--int4) "
            "backbone; merge first, then quantize the merged weights"
        )
    from tpdm_tpu.models.lora import apply_lora
    from tpdm_tpu.train.draft import load_lora

    lora = load_lora(path)
    pipe.mmdit_params = apply_lora(
        pipe.mmdit_params, lora, scale=getattr(args, "lora_scale", 1.0)
    )
    logger.info(
        "merged LoRA %s (%d kernels, scale %.2f)",
        path, len(lora), getattr(args, "lora_scale", 1.0),
    )
    return pipe


def _accel_kwargs(args):
    """(cache_interval, guidance_interval) from the CLI flags, validated
    lightly — full validation lives in the runner/pipeline builders."""
    ci = getattr(args, "cache_interval", 0) or 0
    gi = getattr(args, "guidance_interval", None)
    if isinstance(gi, str):
        parts = gi.split(",")
        if len(parts) != 2:
            raise SystemExit(
                f"--guidance_interval expects 'lo,hi', got {gi!r}"
            )
        gi = (float(parts[0]), float(parts[1]))
    return ci, gi


def _cache_tau(args):
    """--cache_tau validated: input-aware caching is the SD3
    pipeline path's policy (family loops carry the fixed schedule only).
    """
    tau = getattr(args, "cache_tau", 0.0) or 0.0
    if not tau:
        return 0.0
    if (getattr(args, "cache_interval", 0) or 0):
        raise SystemExit(
            "--cache_tau and --cache_interval are mutually exclusive "
            "(one reuse policy)"
        )
    if getattr(args, "continuous", False):
        raise SystemExit(
            "--cache_tau serves through the fixed-batch engine; drop "
            "--continuous"
        )
    return float(tau)


def build_family_world(args):
    """--family sd15|flux: build the agent + encode/decode parts the
    serving engines consume (tpdm_tpu/serving_families.py runner for the
    fixed-batch engine; the parts directly for the continuous engines).
    Toy configs only from the CLI — for real checkpoints construct the
    agent and call make_sd15_runner/make_flux_runner yourself (weights
    conversion is checkpoint-layout specific)."""
    fam = getattr(args, "family", "sd3")
    if getattr(args, "refiner", False) and fam != "sdxl":
        raise SystemExit(
            "--refiner is the SDXL ensemble-of-experts option; "
            "use --family sdxl"
        )
    if fam == "sd3":
        return None
    if not args.toy:
        raise SystemExit(
            f"--family {fam} currently serves --toy configs from the CLI; "
            "for real checkpoints build a runner with "
            "tpdm_tpu.serving_families.make_[sd15|flux]_runner"
        )
    import jax

    if args.cpu and "axon" in str(jax.config.jax_platforms):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tpdm_tpu.models import TimePredictor
    from tpdm_tpu.models.vae import VAE, VAEConfig
    from tpdm_tpu.serving_families import make_vae_decoder
    from tpdm_tpu.train import RLOOConfig

    key = jax.random.PRNGKey(0)
    config = RLOOConfig(max_inference_steps=min(args.max_steps, 8))

    if fam == "sd15":
        if _quant_on(args):
            # fail loudly instead of serving a silently full-precision
            # backbone: the SD1.5 UNet has no quant path (conv-dominated;
            # its 0.86B bf16 fits any chip)
            raise SystemExit(
                "--int8/--int4 are not supported for --family sd15 "
                "(quantization covers the MMDiT/FLUX transformer backbones)"
            )
        from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
        from tpdm_tpu.serving_families import make_sd15_runner
        from tpdm_tpu.train.sd15_agent import SD15Agent

        cfg = UNetConfig.toy(cross_attention_dim=32)
        unet = UNetSD15(cfg)
        tcfg = CLIPTextConfig.toy(hidden_size=32, max_position_embeddings=8)
        text = CLIPTextModel(tcfg)
        text_params = text.init(key, jnp.zeros((1, 8), jnp.int32))
        unet_params = unet.init(
            key,
            jnp.zeros((2, 4, cfg.sample_size, cfg.sample_size)),
            jnp.ones((2,)),
            jnp.zeros((2, 8, 32)),
        )
        agent = SD15Agent(
            unet, unet_params, config,
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * cfg.block_out_channels[0],
                temb_dim=cfg.time_embed_dim,
            ),
        )
        _merge_family_lora(agent, "unet_params", args, "sd15")
        vae = VAE(VAEConfig.toy(latent_channels=4))
        vae_params = vae.init(
            key,
            jnp.zeros((1, 4, cfg.sample_size, cfg.sample_size)),
            jnp.zeros((1, 3, 2 * cfg.sample_size, 2 * cfg.sample_size)),
        )

        def toy_ids(prompt):
            ids = [97] + [abs(hash(w)) % 90 + 1 for w in prompt.split()[:6]] + [98]
            return np.array([ids[:8] + [0] * (8 - len(ids))], np.int32)

        def encode(prompts):
            ids = np.concatenate([toy_ids(p) for p in prompts])
            pe = text.apply(text_params, jnp.asarray(ids))[1]
            npe = text.apply(text_params, jnp.zeros_like(jnp.asarray(ids)))[1]
            return pe, npe

        tpm_params = agent.init_tpm_params(key)
        decode = make_vae_decoder(vae, vae_params)
        return dict(
            family="sd15", agent=agent, tpm_params=tpm_params,
            encode=encode, decode=decode,
            runner=make_sd15_runner(
                agent, tpm_params, encode, decode,
                cache_interval=_accel_kwargs(args)[0],
                guidance_interval=_accel_kwargs(args)[1],
                cache_tau=_cache_tau(args),
            ),
        )

    if fam == "sdxl":
        if _quant_on(args):
            raise SystemExit(
                "--int8/--int4 are not supported for --family sdxl "
                "(quantization covers the MMDiT/FLUX transformer backbones)"
            )
        from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
        from tpdm_tpu.pipeline.text_encoding import SDXLTextEncoders
        from tpdm_tpu.serving_families import make_sdxl_runner
        from tpdm_tpu.train.sdxl_agent import SDXLAgent

        cfg = UNetConfig.toy_xl(cross_attention_dim=16 + 24, addition_pooled_dim=12)
        unet = UNetSD15(cfg)
        lcfg = CLIPTextConfig.toy(
            hidden_size=16, projection_dim=8, max_position_embeddings=8
        )
        gcfg = CLIPTextConfig.toy(
            hidden_size=24, projection_dim=12, max_position_embeddings=8
        )
        lm, gm = CLIPTextModel(lcfg), CLIPTextModel(gcfg)
        lparams = lm.init(key, jnp.zeros((1, 8), jnp.int32))
        gparams = gm.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
        enc = SDXLTextEncoders(lm, lparams, gm, gparams)
        unet_params = unet.init(
            key,
            jnp.zeros((2, 4, cfg.sample_size, cfg.sample_size)),
            jnp.ones((2,)),
            jnp.zeros((2, 8, cfg.cross_attention_dim)),
            {
                "text_embeds": jnp.zeros((2, cfg.addition_pooled_dim)),
                "time_ids": jnp.zeros((2, 6)),
            },
        )
        agent = SDXLAgent(
            unet, unet_params, config,
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * cfg.block_out_channels[0],
                temb_dim=cfg.block_out_channels[0],
            ),
        )
        _merge_family_lora(agent, "unet_params", args, "sdxl")
        vae = VAE(VAEConfig.toy(latent_channels=4))
        vae_params = vae.init(
            key,
            jnp.zeros((1, 4, cfg.sample_size, cfg.sample_size)),
            jnp.zeros((1, 3, 2 * cfg.sample_size, 2 * cfg.sample_size)),
        )

        def toy_ids(prompt):
            ids = [97] + [abs(hash(w)) % 90 + 1 for w in prompt.split()[:6]] + [98]
            return np.array([ids[:8] + [0] * (8 - len(ids))], np.int32)

        def encode(prompts):
            ids = np.concatenate([toy_ids(p) for p in prompts])
            pe = enc.encode(ids)
            ne = enc.encode(np.zeros_like(ids))
            return (
                pe.prompt_embeds, pe.pooled_prompt_embeds,
                ne.prompt_embeds, ne.pooled_prompt_embeds,
            )

        tpm_params = agent.init_tpm_params(key)
        decode = make_vae_decoder(vae, vae_params)
        ci, gi = _accel_kwargs(args)
        runner = make_sdxl_runner(
            agent, tpm_params, encode, decode,
            cache_interval=ci, guidance_interval=gi,
            cache_tau=_cache_tau(args),
        )

        if getattr(args, "refiner", False):
            # base+refiner ensemble-of-experts: the refiner expert is the
            # (0,4,4,0)-wired UNet on bigG-only conditioning with
            # aesthetic-score CFG (pipeline/variants.py
            # sdxl_ensemble_generate; toy geometry here, like every
            # family backbone serve.py builds without weights)
            if getattr(args, "continuous", False):
                raise SystemExit(
                    "--refiner serves through the fixed-batch ensemble "
                    "runner; --continuous is not supported with it"
                )
            if ci or gi is not None or _cache_tau(args):
                raise SystemExit(
                    "--cache_interval/--guidance_interval/--cache_tau are "
                    "not supported with --refiner (the ensemble runner "
                    "owns both experts' sampler configs)"
                )
            from tpdm_tpu.serving_families import make_sdxl_ensemble_runner
            from tpdm_tpu.train.sdxl_agent import SDXLRefinerAgent

            rcfg_unet = UNetConfig.toy_refiner(
                cross_attention_dim=24, addition_pooled_dim=12
            )
            refiner_unet = UNetSD15(rcfg_unet)
            refiner_params = refiner_unet.init(
                jax.random.PRNGKey(7),
                jnp.zeros((2, 4, rcfg_unet.sample_size, rcfg_unet.sample_size)),
                jnp.ones((2,)),
                jnp.zeros((2, 8, rcfg_unet.cross_attention_dim)),
                {
                    "text_embeds": jnp.zeros((2, rcfg_unet.addition_pooled_dim)),
                    "time_ids": jnp.zeros((2, 5)),
                },
            )
            refiner_agent = SDXLRefinerAgent(
                refiner_unet, refiner_params, config,
                tpm=TimePredictor(
                    conv_out_channels=4,
                    in_channels=2 * rcfg_unet.block_out_channels[0],
                    temb_dim=rcfg_unet.block_out_channels[0],
                ),
            )
            refiner_tpm = refiner_agent.init_tpm_params(jax.random.PRNGKey(8))

            def encode_refiner(prompts):
                ids = np.concatenate([toy_ids(p) for p in prompts])
                pe_r = enc.encode_refiner(ids)
                ne_r = enc.encode_refiner(np.zeros_like(ids))
                return (
                    pe_r.prompt_embeds, pe_r.pooled_prompt_embeds,
                    ne_r.prompt_embeds, ne_r.pooled_prompt_embeds,
                )

            runner = make_sdxl_ensemble_runner(
                agent, tpm_params, refiner_agent, refiner_tpm,
                encode, encode_refiner, decode,
                denoising_end=args.denoising_end,
            )

        return dict(
            family="sdxl", agent=agent, tpm_params=tpm_params,
            encode=encode, decode=decode, runner=runner,
        )

    from tpdm_tpu.models.flux import Flux, FluxConfig, pack_latents
    from tpdm_tpu.serving_families import make_flux_runner
    from tpdm_tpu.train.flux_agent import FluxAgent

    fcfg = FluxConfig.toy(
        quant_matmuls=_quant_on(args), quant_bits=_quant_bits(args)
    )
    model = Flux(fcfg)
    n_txt = 5
    tokens, img_ids = pack_latents(jnp.zeros((2, 4, 8, 8)))
    params = model.init(
        key, tokens, img_ids, jnp.zeros((2, n_txt, fcfg.txt_dim)),
        jnp.zeros((2, n_txt, 3)), jnp.ones((2,)),
        jnp.zeros((2, fcfg.vec_dim)), jnp.full((2,), 3.5),
    )
    if fcfg.quant_matmuls:
        from tpdm_tpu.ops.quant import prequantize_params

        params = prequantize_params(params)
    agent = FluxAgent(
        model, params, config,
        tpm=TimePredictor(
            conv_out_channels=4,
            in_channels=2 * fcfg.hidden_size,
            temb_dim=fcfg.hidden_size,
        ),
        latent_size=8,
        latent_channels=4,
    )
    if getattr(args, "lora", None):
        lora_path, named = _split_lora_args(args)
        if named:
            if not (
                getattr(args, "lora_fused", False)
                and getattr(args, "continuous", False)
            ):
                raise SystemExit(
                    "--family flux NAME=PATH adapters need --continuous "
                    "--lora_fused (per-slot fused deltas; a merged 12B "
                    "copy per tenant would not fit); a bare path merges "
                    "a single adapter at load"
                )
            # registered on the continuous engine in make_http_server
            lora_path = None
        if lora_path is not None:
            if fcfg.quant_matmuls:
                raise SystemExit(
                    "--lora cannot merge into a quantized (--int8/--int4) "
                    "backbone; merge first, then quantize the merged "
                    "weights"
                )
            from tpdm_tpu.models.lora import apply_lora
            from tpdm_tpu.train.draft import load_lora

            lora = load_lora(lora_path)
            agent.flux_params = apply_lora(
                agent.flux_params, lora,
                scale=getattr(args, "lora_scale", 1.0),
            )
            logger.info(
                "merged LoRA %s into the FLUX backbone (%d kernels)",
                lora_path, len(lora),
            )

    vae = VAE(VAEConfig.toy(latent_channels=4))
    vae_params = vae.init(key, jnp.zeros((1, 4, 8, 8)), jnp.zeros((1, 3, 16, 16)))

    def encode(prompts):
        txt = np.stack([
            np.random.default_rng(abs(hash(p)) % 2**31)
            .normal(size=(n_txt, fcfg.txt_dim)).astype(np.float32)
            for p in prompts
        ])
        pooled = np.stack([
            np.random.default_rng(abs(hash(p)) % 2**31 + 1)
            .normal(size=(fcfg.vec_dim,)).astype(np.float32)
            for p in prompts
        ])
        return jnp.asarray(txt), jnp.asarray(pooled)

    tpm_params = agent.init_tpm_params(key)
    decode = make_vae_decoder(vae, vae_params)
    return dict(
        family="flux", agent=agent, tpm_params=tpm_params,
        encode=encode, decode=decode,
        runner=make_flux_runner(
            agent, tpm_params, encode, decode,
            cache_interval=_accel_kwargs(args)[0],
            guidance_interval=_accel_kwargs(args)[1],
            cache_tau=_cache_tau(args),
        ),
    )


def _maybe_few_step(world, args):
    """--few_step: swap the world's adaptive runner for the consistency
    few-step runner (distilled-student serving)."""
    fs = getattr(args, "few_step", None)
    if not fs:
        return world
    if world is None:
        raise SystemExit(
            "--few_step serves the family runners (--family sd15|sdxl|"
            "flux); for SD3 build a TPDMAgent and use "
            "tpdm_tpu.train.make_few_step_sampler directly"
        )
    if getattr(args, "continuous", False):
        raise SystemExit(
            "--few_step serves through the fixed-batch runner; drop "
            "--continuous"
        )
    if getattr(args, "refiner", False):
        raise SystemExit("--few_step is not supported with --refiner")
    ci, gi = _accel_kwargs(args)
    if ci or gi is not None or _cache_tau(args):
        raise SystemExit(
            "--few_step replaces the sampler entirely; drop "
            "--cache_interval/--guidance_interval/--cache_tau"
        )
    from tpdm_tpu.serving_families import make_few_step_runner

    levels = tuple(int(x) for x in str(fs).split(",") if x != "")
    world = dict(world)
    world["runner"] = make_few_step_runner(
        world["agent"], world["encode"], world["decode"],
        levels=levels, num_ladder_steps=args.max_steps,
    )
    return world


def build_family_runner(args):
    """Back-compat: the fixed-batch runner for --family sd15|flux."""
    world = _maybe_few_step(build_family_world(args), args)
    return None if world is None else world["runner"]


def generate(pipe, tokenize, prompt, seed, max_steps,
             cache_interval=0, guidance_interval=None, cache_tau=0.0,
             solver="euler"):
    import numpy as np

    clip_ids, t5_ids = tokenize(prompt)
    res = pipe.generate(
        clip_ids=clip_ids,
        t5_ids=t5_ids,
        negative_clip_ids=np.zeros_like(clip_ids),
        negative_t5_ids=np.zeros_like(t5_ids),
        predict=True,  # deterministic schedules (gradio_sd3_inference.py:45)
        seed=seed,
        max_inference_steps=max_steps,
        cache_interval=cache_interval,
        guidance_interval=guidance_interval,
        cache_tau=cache_tau,
        solver=solver,
    )
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained", default=None)
    p.add_argument("--tpm", default=None)
    p.add_argument("--toy", action="store_true")
    p.add_argument("--family", choices=["sd3", "sd15", "sdxl", "flux"],
                   default="sd3",
                   help="model family to serve (sd15/sdxl/flux: toy configs "
                        "via the engine's runner delegate)")
    p.add_argument("--refiner", action="store_true",
                   help="--family sdxl: serve the base+refiner "
                        "ensemble-of-experts (two adaptive TPM loops with "
                        "an exact per-sample handoff at --denoising_end)")
    p.add_argument("--denoising_end", type=float, default=0.8,
                   help="--refiner handoff point: the base expert denoises "
                        "t >= round(999*(1-denoising_end)), the refiner "
                        "finishes")
    p.add_argument("--cli", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--prompt", default="a serene mountain lake at dawn")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_steps", type=int, default=35)
    p.add_argument("--max_batch", type=int, default=2,
                   help="compiled serving batch; partial batches pad to it")
    p.add_argument("--batch_window_ms", type=float, default=25.0)
    p.add_argument("--dp", type=int, default=None,
                   help="shard batches over N devices (data-parallel replicas)")
    p.add_argument("--mesh", default=None,
                   help="'data,fsdp,tensor' sharded-MODEL serving: weights "
                        "split over the mesh instead of replicated per chip")
    p.add_argument("--continuous", action="store_true",
                   help="step-level continuous batching: finished slots are "
                        "refilled mid-denoise (best with a trained TPM whose "
                        "NFE varies per prompt)")
    p.add_argument("--pipeline_depth", type=int, default=1,
                   help="continuous engine: keep N dispatched segments in "
                        "flight, reading results back while the device "
                        "runs ahead — hides the per-segment host sync "
                        "(2 is the useful setting; 1 = synchronous)")
    p.add_argument("--decode_batch", type=int, default=1,
                   help="continuous engine: coalesce up to N finished "
                        "slots into one batched VAE decode (pow-2 "
                        "padded; the decode amortizes markedly batched)")
    p.add_argument("--seg_steps", type=int, default=4,
                   help="denoise steps per jitted segment between slot-"
                        "recycling syncs (--continuous only)")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--lora", action="append", default=None,
                   help="LoRA safetensors from train/draft.py. A bare PATH "
                        "is merged into the backbone weights at load (base "
                        "checkpoint untouched on disk). NAME=PATH (repeat "
                        "the flag) registers named adapters for multi-"
                        "tenant serving instead: requests select one via "
                        '{"lora": "NAME"} (SD3 engines — fixed-batch or '
                        "--continuous; base model serves requests without "
                        "the field)")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--lora_cache", type=int, default=1,
                   help="merged-backbone LRU entries for NAME=PATH adapters "
                        "(each is a full backbone copy in device memory)")
    p.add_argument("--lora_fused", action="store_true",
                   help="continuous engine only: apply NAME=PATH adapters "
                        "as per-slot rank-r deltas inside the backbone "
                        "(one segment advances every tenant — full slot "
                        "utilization for any adapter mix, no merged "
                        "weight copies) instead of time-multiplexing "
                        "merged trees")
    p.add_argument("--tb_dir", default=None,
                   help="stream engine stats() to TensorBoard event files "
                        "in this directory every --tb_interval seconds "
                        "(native writer, utils/tb_writer.py)")
    p.add_argument("--tb_interval", type=float, default=10.0)
    p.add_argument("--out", default="generated.png")
    p.add_argument("--reward_checkpoint", default=None,
                   help="converted ImageReward safetensors: enables reward "
                        "ranking on the /rank best-of-N endpoint")
    p.add_argument("--bert_vocab", default=None,
                   help="BERT vocab.txt for the ImageReward tokenizer "
                        "(required with --reward_checkpoint)")
    p.add_argument("--max_rank_n", type=int, default=8,
                   help="cap on candidates per /rank request")
    p.add_argument("--quant_text", action="store_true",
                   help="also store the T5-XXL tower int8/int4 "
                        "(weight-only, fp activations): halves/quarters "
                        "the 9.5 GB host->device stream per cold-prompt "
                        "encode")
    p.add_argument("--int4", action="store_true",
                   help="stored group-int4 backbone weights (weight-only, "
                        "fp compute): 4x smaller than bf16 — the capacity "
                        "mode that fits 12B-class backbones in a few GB")
    p.add_argument("--int8", action="store_true",
                   help="stored-int8 backbone matmul weights (W8A8-dynamic; "
                        "--family flux quantizes modulations weight-only): "
                        "halves backbone weight HBM for bigger batches/"
                        "caches; quality must be validated per checkpoint")
    p.add_argument("--few_step", default=None,
                   help="comma list of consistency-ladder levels (e.g. "
                        "'0,14'): serve a DISTILLED student (--trainer "
                        "distill; merge its LoRA via --lora) with the "
                        "fixed few-step consistency sampler instead of "
                        "the adaptive TPM loop — NFE = len(levels). "
                        "Families sd15/sdxl/flux; ladder length = "
                        "--max_steps")
    p.add_argument("--solver", default="euler", choices=["euler", "ab2"],
                   help="latent integrator for the SD3 adaptive loop: "
                        "euler (reference rule) or ab2 (two-step Adams-"
                        "Bashforth — second-order trajectory accuracy at "
                        "identical per-step cost). SD3 fixed-batch engine, "
                        "--cli, and the SD3 --continuous engine (AB2 state "
                        "is per-segment: first step of each segment is "
                        "Euler); family runners keep euler")
    p.add_argument("--cache_interval", type=int, default=0,
                   help="training-free block caching for serving: >= 2 "
                        "refreshes the deep/back-block feature every N "
                        "steps and reuses it in between (Δ-DiT for "
                        "sd3/flux, DeepCache for sd15/sdxl; approximate — "
                        "docs/PERF.md measured 2.14x on SD3). Fixed-batch "
                        "runners, --cli, and the SD3 --continuous engine "
                        "(per-segment cache: every segment starts with a "
                        "fresh Δ so slot refills stay exact)")
    p.add_argument("--cache_tau", type=float, default=0.0,
                   help="input-aware (TeaCache-class) block caching: "
                        "accumulate the per-step relative latent change "
                        "on device and refresh the deep blocks only once "
                        "it exceeds tau (full forwards land where the "
                        "trajectory turns instead of on a fixed grid). "
                        "All families; mutually exclusive with "
                        "--cache_interval; fixed-batch engines only")
    p.add_argument("--guidance_interval", default=None,
                   help="'lo,hi': apply CFG only inside the noise window "
                        "(sigma units for sd3, integer-t for sd15/sdxl; "
                        "steps outside run the half-cost conditional-only "
                        "branch — measured 1.29x at a 15/28 window). "
                        "Mutually exclusive with --cache_interval")
    p.add_argument("--resolutions", default=None,
                   help="comma-separated extra output resolutions (image px) "
                        "servable per request, e.g. '512,2048'; the model "
                        "default is always served. Each is one compiled "
                        "shape (requests coalesce per-resolution)")
    args = p.parse_args()

    if getattr(args, "solver", "euler") != "euler":
        if getattr(args, "family", "sd3") != "sd3":
            raise SystemExit(
                "--solver serves the SD3 engines and --cli; family "
                "runners keep euler"
            )
        if getattr(args, "continuous", False) and getattr(
            args, "resolutions", None
        ):
            raise SystemExit(
                "--solver with --continuous serves the single-resolution "
                "engine; drop --resolutions"
            )

    # persistent compile cache: a restarted server repays nothing for
    # unchanged jit graphs (cold SD3-medium compiles cost minutes on TPU)
    from tpdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    world = _maybe_few_step(build_family_world(args), args)
    if world is not None:
        pipe = None
        runner = world["runner"]

        def tokenize(prompt, _n=None):  # runner owns encoding; engine only
            return None, None           # needs the prompt strings

        if args.cli:
            from PIL import Image

            res = runner([args.prompt], [args.seed], [args.max_steps])[0]
            Image.fromarray(res["image"]).save(args.out)
            print(
                f"saved {args.out}; inference steps: "
                f"{res['inference_steps']} / cap {args.max_steps}"
            )
            return
        engine, server = make_http_server(
            pipe, tokenize, args, runner=runner, family_world=world
        )
        engine.start()
        streamer = _maybe_stats_streamer(engine, args)
        logger.info(
            "serving %s on http://127.0.0.1:%d/generate",
            args.family, server.server_address[1],
        )
        try:
            server.serve_forever()
        finally:
            if streamer is not None:
                streamer.stop()
            engine.stop()
            server.server_close()
        return

    pipe, tokenize = build_pipeline(args)

    if args.cli:
        from PIL import Image

        ci, gi = _accel_kwargs(args)
        res = generate(pipe, tokenize, args.prompt, args.seed,
                       args.max_steps, cache_interval=ci,
                       guidance_interval=gi, cache_tau=_cache_tau(args),
                       solver=getattr(args, "solver", "euler"))
        Image.fromarray(res.images[0]).save(args.out)
        nfe = int(res.last_valid_index[0]) + 1
        print(f"saved {args.out}; inference steps: {nfe} / cap {args.max_steps}")
        return

    try:
        import gradio as gr

        def fn(prompt, seed):
            res = generate(pipe, tokenize, prompt, int(seed), args.max_steps)
            nfe = int(res.last_valid_index[0]) + 1
            return res.images[0], f"Inference steps: {nfe}"

        gr.Interface(
            fn,
            inputs=[gr.Textbox(label="prompt"), gr.Number(value=42, label="seed")],
            outputs=[gr.Image(), gr.Textbox(label="steps")],
            title="TPDM-TPU: adaptive-schedule diffusion",
        ).launch(server_port=args.port)
        return
    except ImportError:
        logger.info("gradio not installed; starting stdlib HTTP server")

    engine, server = make_http_server(pipe, tokenize, args)
    engine.start()
    streamer = _maybe_stats_streamer(engine, args)
    logger.info(
        "serving on http://127.0.0.1:%d/generate (POST json; GET /stats) — "
        "batched (max_batch=%d, window=%.0fms%s)",
        server.server_address[1], args.max_batch, args.batch_window_ms,
        f", dp={args.dp}" if args.dp else "",
    )
    # Graceful drain on SIGTERM (pod eviction / ctrl-C): stop accepting,
    # let the engine finish in-flight batches, then exit. serve_forever()
    # returns once shutdown() is called from the signal handler's thread.
    import signal
    import threading

    def _drain(signum, frame):
        logger.info("signal %d: draining and shutting down", signum)
        threading.Thread(target=server.shutdown, daemon=True).start()

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _drain)
    try:
        server.serve_forever()
    finally:
        if streamer is not None:
            streamer.stop()
        engine.stop()
        server.server_close()


def _maybe_stats_streamer(engine, args):
    """--tb_dir: live engine stats in TensorBoard (utils/tb_writer.py)."""
    if not args.tb_dir:
        return None
    from tpdm_tpu.utils.tb_writer import StatsStreamer

    return StatsStreamer(engine.stats, args.tb_dir, args.tb_interval)


def _pipe_vae_scale_factor(pipe) -> int:
    """px-per-latent of the pipeline's VAE (8 for SD VAEs; the toy test
    VAE is 2); 8 when the pipeline decodes no images."""
    if pipe is not None and getattr(pipe, "vae", None) is not None:
        from tpdm_tpu.models.vae import vae_scale_factor

        return vae_scale_factor(pipe.vae.config)
    return 8


def make_http_server(pipe, tokenize, args, runner=None, family_world=None):
    """Threaded HTTP server over a BatchingEngine: concurrent requests
    coalesce into one fixed-shape device batch (tpdm_tpu/serving.py)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from tpdm_tpu.serving import BatchingEngine

    mesh_shape = getattr(args, "mesh", None)
    if mesh_shape:
        mesh_shape = tuple(int(x) for x in mesh_shape.split(","))
    if runner is not None:
        if getattr(args, "resolutions", None):
            # fail loudly instead of serving a silently ignored knob: the
            # family agents bake their latent geometry into the compiled
            # sampler (SD15Agent/FluxAgent latent_size)
            raise SystemExit(
                "--resolutions is SD3-only (fixed-batch sub-batches or "
                "MultiResContinuousRouter); the sd15/flux family agents "
                "serve one latent geometry per agent"
            )
        if getattr(args, "continuous", False):
            if family_world is None:
                raise SystemExit(
                    "--continuous with a bare runner needs the family world "
                    "(agent/encode/decode) — use serve.py --family, or build "
                    "a Continuous{SD15,Flux}Engine directly"
                )
            ci, gi = _accel_kwargs(args)
            if ci or gi is not None:
                raise SystemExit(
                    "--cache_interval/--guidance_interval serve through "
                    "the fixed-batch runners (the FAMILY continuous "
                    "engines' segment loops do not carry the cache/branch "
                    "state; the SD3 continuous engine supports "
                    "--cache_interval) — drop --continuous"
                )
            from tpdm_tpu.serving_continuous import (
                ContinuousFluxEngine,
                ContinuousSD15Engine,
                ContinuousSDXLEngine,
            )

            cls = {
                "sd15": ContinuousSD15Engine,
                "sdxl": ContinuousSDXLEngine,
                "flux": ContinuousFluxEngine,
            }[family_world["family"]]
            engine = cls(
                family_world["agent"],
                family_world["encode"],
                decode=family_world["decode"],
                tpm_params=family_world["tpm_params"],
                slots=args.max_batch,
                seg_steps=getattr(args, "seg_steps", 4),
                dp=args.dp,
                mesh_shape=mesh_shape,
                fused_lora=getattr(args, "lora_fused", False),
                pipeline_depth=getattr(args, "pipeline_depth", 1) or 1,
                decode_batch=getattr(args, "decode_batch", 1) or 1,
                # default max_steps: the agent's own compiled step budget
                # (the toy worlds already clamp it to min(args.max_steps, 8))
            )
        else:
            engine = BatchingEngine(
                pipe,
                tokenize,
                max_batch=args.max_batch,
                window_ms=args.batch_window_ms,
                max_steps=args.max_steps,
                runner=runner,
            )
    elif getattr(args, "continuous", False):
        from tpdm_tpu.serving_continuous import (
            ContinuousBatchingEngine,
            MultiResContinuousRouter,
        )

        res_list = getattr(args, "resolutions", None)
        if isinstance(res_list, str):
            res_list = [int(x) for x in res_list.split(",") if x]
        if res_list:
            _ci, _gi = _accel_kwargs(args)
            if _gi is not None or _cache_tau(args):
                raise SystemExit(
                    "--guidance_interval/--cache_tau serve through the "
                    "fixed-batch engine — drop --continuous"
                )
            if getattr(args, "solver", "euler") != "euler":
                raise SystemExit(
                    "--solver with --continuous serves the single-"
                    "resolution engine; drop --resolutions"
                )
            engine = MultiResContinuousRouter(
                pipe,
                tokenize,
                resolutions=res_list,
                slots=args.max_batch,
                seg_steps=getattr(args, "seg_steps", 4),
                max_steps=args.max_steps,
                dp=args.dp,
                mesh_shape=mesh_shape,
                vae_scale_factor=_pipe_vae_scale_factor(pipe),
                pipeline_depth=getattr(args, "pipeline_depth", 1) or 1,
                decode_batch=getattr(args, "decode_batch", 1) or 1,
                cache_interval=_ci,
            )
        else:
            _ci, _gi = _accel_kwargs(args)
            if _gi is not None or _cache_tau(args):
                raise SystemExit(
                    "--guidance_interval/--cache_tau serve through the "
                    "fixed-batch engine (the continuous segment dispatch "
                    "carries the per-SEGMENT Δ-cache only — use "
                    "--cache_interval) — drop --continuous"
                )
            engine = ContinuousBatchingEngine(
                pipe,
                tokenize,
                slots=args.max_batch,
                seg_steps=getattr(args, "seg_steps", 4),
                max_steps=args.max_steps,
                dp=args.dp,
                mesh_shape=mesh_shape,
                fused_lora=getattr(args, "lora_fused", False),
                pipeline_depth=getattr(args, "pipeline_depth", 1) or 1,
                decode_batch=getattr(args, "decode_batch", 1) or 1,
                cache_interval=_ci,
                solver=getattr(args, "solver", "euler"),
            )
    else:
        res_list = getattr(args, "resolutions", None)
        if isinstance(res_list, str):
            res_list = [int(x) for x in res_list.split(",") if x]
        ci, gi = _accel_kwargs(args)
        engine = BatchingEngine(
            pipe,
            tokenize,
            max_batch=args.max_batch,
            window_ms=args.batch_window_ms,
            max_steps=args.max_steps,
            dp=args.dp,
            mesh_shape=mesh_shape,
            resolutions=res_list,
            vae_scale_factor=_pipe_vae_scale_factor(pipe),
            cache_interval=ci,
            guidance_interval=gi,
            cache_tau=_cache_tau(args),
            solver=getattr(args, "solver", "euler"),
        )

    # multi-tenant adapters (--lora NAME=PATH): SD3 engines (merged
    # multiplex or fused) and family continuous engines (fused-only)
    _merge_path, _named_adapters = _split_lora_args(args)
    if getattr(args, "lora_fused", False):
        from tpdm_tpu.serving_continuous import ContinuousBatchingEngine

        if not isinstance(engine, ContinuousBatchingEngine):
            raise SystemExit(
                "--lora_fused needs a single continuous engine "
                "(--continuous, no --resolutions router)"
            )
        if not _named_adapters:
            raise SystemExit("--lora_fused without --lora NAME=PATH adapters")
    if _named_adapters:
        from tpdm_tpu.serving_continuous import (
            ContinuousBatchingEngine,
            _AgentContinuousEngine,
        )

        ok_fixed = isinstance(engine, BatchingEngine) and runner is None
        ok_cont = isinstance(engine, ContinuousBatchingEngine) and (
            getattr(engine, "pipe", None) is not None
            or (
                getattr(args, "lora_fused", False)
                and isinstance(engine, _AgentContinuousEngine)
            )
        )
        if not (ok_fixed or ok_cont):
            raise SystemExit(
                "--lora NAME=PATH needs an SD3 engine — fixed-batch "
                "(per-adapter sub-batches) or --continuous (time-"
                "multiplexed segments) — or a family engine with "
                "--continuous --lora_fused (per-slot fused deltas); the "
                "multi-res router doesn't serve per-request adapters"
            )
        from tpdm_tpu.train.draft import load_lora

        for name, path in _named_adapters:
            engine.register_adapter(
                name, load_lora(path),
                scale=getattr(args, "lora_scale", 1.0),
                merged_cache=getattr(args, "lora_cache", 1) or 1,
            )
            logger.info("registered adapter %r from %s", name, path)

    # best-of-N reward ranking (/rank): optional — needs a converted
    # ImageReward checkpoint + BERT vocab (native WordPiece tokenizer)
    ranker = None
    if getattr(args, "reward_checkpoint", None):
        from tpdm_tpu.train.builders import build_inference_ranker

        ranker = build_inference_ranker(
            reward_checkpoint=args.reward_checkpoint,
            tokenizer_path=args.bert_vocab,
        )

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: every response carries Content-Length
        # (_reply and send_error both do), so persistent connections are
        # safe — and they remove the HTTP/1.0 close-vs-reuse race where a
        # client pipelining a second request onto a just-closed socket got
        # RemoteDisconnected.
        protocol_version = "HTTP/1.1"

        def do_GET(self):
            if self.path == "/stats":
                self._reply(engine.stats())
                return
            if self.path == "/healthz":
                # liveness: the worker thread must still be running
                alive = getattr(engine, "_thread", None) is not None
                body = b"ok\n" if alive else b"stopped\n"
                self.send_response(200 if alive else 503)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/metrics":
                from tpdm_tpu.utils.metrics_export import prometheus_text

                body = prometheus_text(engine.stats()).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_error(404)

        def do_POST(self):
            if self.path == "/rank":
                self._do_rank()
                return
            if self.path != "/generate":
                self.send_error(404)
                return
            # validate untrusted input BEFORE it reaches the batch worker:
            # one bad request must not poison a coalesced batch
            try:
                length = int(self.headers.get("Content-Length", 0))
                # prompt + seed fits in 64K; allow room for an img2img
                # init image (base64 PNG) while still bounding the body
                if length > 8 * 1024 * 1024:
                    self.send_error(413, "request body too large")
                    return
                req = json.loads(self.rfile.read(length) or b"{}")
                prompt = req.get("prompt", args.prompt)
                if not isinstance(prompt, str):
                    raise ValueError("prompt must be a string")
                init_image = None
                strength = None
                if req.get("init_image_png_base64"):
                    import numpy as np
                    from PIL import Image

                    raw = base64.b64decode(req["init_image_png_base64"])
                    pil = Image.open(io.BytesIO(raw)).convert("RGB")
                    init_image = np.asarray(pil, dtype=np.uint8)
                    strength = req.get("strength")
                    if strength is not None:
                        strength = float(strength)
                seed = int(req.get("seed", args.seed))
                steps = req.get("steps")
                if steps is not None:
                    steps = int(steps)
                    if not 1 <= steps <= args.max_steps:
                        raise ValueError(
                            f"steps must be in [1, {args.max_steps}]"
                        )
                resolution = req.get("resolution")
                if resolution is not None:
                    resolution = int(resolution)
                deadline_s = req.get("deadline_s")
                if deadline_s is not None:
                    deadline_s = float(deadline_s)
                    if deadline_s <= 0:
                        raise ValueError("deadline_s must be > 0")
                guidance = req.get("guidance_scale")
                if guidance is not None:
                    guidance = float(guidance)
                negative = req.get("negative_prompt")
                if negative is not None and not isinstance(negative, str):
                    raise ValueError("negative_prompt must be a string")
                lora = req.get("lora")
                if lora is not None and not isinstance(lora, str):
                    raise ValueError("lora must be an adapter name string")
                if lora is not None and not hasattr(engine, "register_adapter"):
                    raise ValueError("this engine does not serve adapters")
                fmt = _check_format(req.get("format"))
                if init_image is not None:
                    import inspect

                    if "init_image" not in inspect.signature(
                        engine.submit
                    ).parameters:
                        raise ValueError(
                            "this engine does not serve img2img (use the "
                            "fixed-batch SD3 engine)"
                        )
            except Exception as e:
                self.send_error(400, str(e)[:100])
                return
            from tpdm_tpu.serving import EngineOverloaded, RequestExpired

            try:
                kw = {} if lora is None else {"lora": lora}
                if init_image is not None:
                    kw["init_image"] = init_image
                    if strength is not None:
                        kw["strength"] = strength
                if guidance is not None:
                    kw["guidance_scale"] = guidance
                if negative:
                    kw["negative_prompt"] = negative
                res = engine.submit(
                    prompt, seed, steps=steps, resolution=resolution,
                    deadline_s=deadline_s, **kw,
                ).result(timeout=600)
            except ValueError as e:  # unknown resolution etc.
                self.send_error(400, str(e)[:100])
                return
            except RequestExpired as e:  # queued past its deadline
                self.send_error(503, str(e)[:100])
                return
            except EngineOverloaded as e:
                self.send_error(503, str(e)[:100])
                return
            except Exception as e:
                self.send_error(500, str(e)[:100])
                return
            try:
                key, data = _encode_image(res["image"], fmt)
            except ValueError as e:
                self.send_error(400, str(e)[:100])
                return
            self._reply(
                {
                    key: data,
                    "inference_steps": res["inference_steps"],
                    "sigmas": res["sigmas"],
                }
            )

        def _do_rank(self):
            """Best-of-N: generate `n` seeds for one prompt; with a reward
            ranker configured, rank them (serving surface for
            ImageReward.inference_rank, reference
            src/reward_models/ImageReward/ImageReward.py:144-183)."""
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > 65536:
                    self.send_error(413, "request body too large")
                    return
                req = json.loads(self.rfile.read(length) or b"{}")
                prompt = req.get("prompt", args.prompt)
                if not isinstance(prompt, str):
                    raise ValueError("prompt must be a string")
                seed = int(req.get("seed", args.seed))
                n = int(req.get("n", 4))
                max_n = getattr(args, "max_rank_n", 8)
                if not 1 <= n <= max_n:
                    raise ValueError(f"n must be in [1, {max_n}]")
                steps = req.get("steps")
                if steps is not None:
                    steps = int(steps)
                    if not 1 <= steps <= args.max_steps:
                        raise ValueError(f"steps must be in [1, {args.max_steps}]")
                lora = req.get("lora")
                if lora is not None and not isinstance(lora, str):
                    raise ValueError("lora must be an adapter name string")
                if lora is not None and not hasattr(engine, "register_adapter"):
                    raise ValueError("this engine does not serve adapters")
                fmt = _check_format(req.get("format"))
            except Exception as e:
                self.send_error(400, str(e)[:100])
                return
            from tpdm_tpu.serving import EngineOverloaded, generate_ranked

            try:
                out = generate_ranked(
                    engine, prompt, seed=seed, n=n, steps=steps, ranker=ranker,
                    lora=lora,
                )
            except ValueError as e:  # unknown adapter etc.
                self.send_error(400, str(e)[:100])
                return
            except EngineOverloaded as e:
                self.send_error(503, str(e)[:100])
                return
            except Exception as e:
                self.send_error(500, str(e)[:100])
                return
            payload = {
                "seeds": out["seeds"],
                "inference_steps": [
                    c["inference_steps"] for c in out["candidates"]
                ],
                "ranked": "ranking" in out,
            }
            for k in ("ranking", "rewards", "best"):
                if k in out:
                    payload[k] = out[k]
            encoded = [_encode_image(c["image"], fmt)
                       for c in out["candidates"]]
            payload[f"images_{fmt}_base64"] = [d for _, d in encoded]
            self._reply(payload)

        def _reply(self, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            logger.info("%s", a)

    server = ThreadingHTTPServer(("127.0.0.1", args.port), Handler)
    return engine, server


if __name__ == "__main__":
    main()
