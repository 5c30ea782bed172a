"""torch/safetensors checkpoint -> flax parameter tree converters.

Maps the public checkpoint layouts the reference consumes — diffusers
`SD3Transformer2DModel` / `AutoencoderKL`, transformers
`CLIPTextModelWithProjection` / `T5EncoderModel`, and the TPDM TPM
safetensors (`agent_model.`-prefixed, reference: gradio_sd3_inference.py:20-21
and inference.ipynb cell 1) — onto the tpdm_tpu flax module trees.

Conventions: torch Linear weight (out, in) -> flax Dense kernel (in, out);
torch Conv2d weight (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out);
LayerNorm/GroupNorm weight -> scale. All outputs are numpy/jnp arrays; pass
`dtype` to cast (bf16 for TPU inference).
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read a .safetensors file into numpy arrays (no torch needed)."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


class _SD:
    """State-dict view that tracks consumed keys (catches naming drift)."""

    def __init__(self, sd: Mapping, dtype=None, prefix: str = ""):
        self.sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        self.dtype = dtype
        self.used: set = set()

    def __call__(self, key: str) -> np.ndarray:
        self.used.add(key)
        arr = _np(self.sd[key])
        if self.dtype is not None:
            arr = arr.astype(self.dtype)
        return arr

    def has(self, key: str) -> bool:
        return key in self.sd

    def unused(self) -> set:
        return set(self.sd) - self.used


def _dense(sd: _SD, key: str, bias: bool = True) -> dict:
    out = {"kernel": sd(f"{key}.weight").T}
    if bias and sd.has(f"{key}.bias"):
        out["bias"] = sd(f"{key}.bias")
    return out


def _ln(sd: _SD, key: str) -> dict:
    return {"scale": sd(f"{key}.weight"), "bias": sd(f"{key}.bias")}


def _conv(sd: _SD, key: str) -> dict:
    return {
        "kernel": sd(f"{key}.weight").transpose(2, 3, 1, 0),
        "bias": sd(f"{key}.bias"),
    }


# ---------------------------------------------------------------------------
# CLIP text encoder (transformers CLIPTextModelWithProjection)
# ---------------------------------------------------------------------------


def convert_clip_text(state_dict: Mapping, num_layers: int, dtype=None) -> dict:
    sd = _SD(state_dict, dtype)
    p: dict = {
        "token_embedding": {"embedding": sd("text_model.embeddings.token_embedding.weight")},
        "position_embedding": sd("text_model.embeddings.position_embedding.weight"),
        "final_layer_norm": _ln(sd, "text_model.final_layer_norm"),
        "text_projection": {"kernel": sd("text_projection.weight").T},
    }
    for i in range(num_layers):
        base = f"text_model.encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": {
                name: _dense(sd, f"{base}.self_attn.{name}")
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "layer_norm1": _ln(sd, f"{base}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{base}.layer_norm2"),
            "fc1": _dense(sd, f"{base}.mlp.fc1"),
            "fc2": _dense(sd, f"{base}.mlp.fc2"),
        }
    return {"params": p}


# ---------------------------------------------------------------------------
# T5 encoder (transformers T5EncoderModel)
# ---------------------------------------------------------------------------


def convert_t5(state_dict: Mapping, num_layers: int, dtype=None) -> dict:
    sd = _SD(state_dict, dtype)
    p: dict = {
        "shared": {"embedding": sd("shared.weight")},
        "final_layer_norm": {"weight": sd("encoder.final_layer_norm.weight")},
    }
    for i in range(num_layers):
        base = f"encoder.block.{i}.layer"
        att = {
            name: {"kernel": sd(f"{base}.0.SelfAttention.{name}.weight").T}
            for name in ("q", "k", "v", "o")
        }
        if i == 0:
            att["relative_attention_bias"] = sd(
                f"{base}.0.SelfAttention.relative_attention_bias.weight"
            )
        p[f"block_{i}"] = {
            "attention": att,
            "ln_attn": {"weight": sd(f"{base}.0.layer_norm.weight")},
            "ln_mlp": {"weight": sd(f"{base}.1.layer_norm.weight")},
            "wi_0": {"kernel": sd(f"{base}.1.DenseReluDense.wi_0.weight").T},
            "wi_1": {"kernel": sd(f"{base}.1.DenseReluDense.wi_1.weight").T},
            "wo": {"kernel": sd(f"{base}.1.DenseReluDense.wo.weight").T},
        }
    return {"params": p}


# ---------------------------------------------------------------------------
# SD3 MMDiT (diffusers SD3Transformer2DModel)
# ---------------------------------------------------------------------------


def convert_mmdit(
    state_dict: Mapping,
    num_layers: int,
    dual_attention_layers=(),
    qk_norm: Optional[str] = None,
    dtype=None,
) -> dict:
    sd = _SD(state_dict, dtype)

    # patchify conv -> Dense over (kh, kw, c)-flattened patches
    w = sd("pos_embed.proj.weight")  # (embed, c, p, p)
    patch_kernel = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])

    p: dict = {
        "pos_embed": {"proj": {"kernel": patch_kernel, "bias": sd("pos_embed.proj.bias")}},
        "time_text_embed": {
            "timestep_embedder": {
                "linear_1": _dense(sd, "time_text_embed.timestep_embedder.linear_1"),
                "linear_2": _dense(sd, "time_text_embed.timestep_embedder.linear_2"),
            },
            "text_embedder": {
                "linear_1": _dense(sd, "time_text_embed.text_embedder.linear_1"),
                "linear_2": _dense(sd, "time_text_embed.text_embedder.linear_2"),
            },
        },
        "context_embedder": _dense(sd, "context_embedder"),
        "norm_out": {"linear": _dense(sd, "norm_out.linear")},
        "proj_out": _dense(sd, "proj_out"),
    }

    def attn_tree(base: str, joint: bool, pre_only: bool) -> dict:
        t = {
            "to_q": _dense(sd, f"{base}.to_q"),
            "to_k": _dense(sd, f"{base}.to_k"),
            "to_v": _dense(sd, f"{base}.to_v"),
            "to_out": _dense(sd, f"{base}.to_out.0"),
        }
        if qk_norm == "rms_norm":
            t["norm_q"] = {"scale": sd(f"{base}.norm_q.weight")}
            t["norm_k"] = {"scale": sd(f"{base}.norm_k.weight")}
        if joint:
            for name in ("add_q_proj", "add_k_proj", "add_v_proj"):
                t[name] = _dense(sd, f"{base}.{name}")
            if qk_norm == "rms_norm":
                t["norm_added_q"] = {"scale": sd(f"{base}.norm_added_q.weight")}
                t["norm_added_k"] = {"scale": sd(f"{base}.norm_added_k.weight")}
            if not pre_only:
                t["to_add_out"] = _dense(sd, f"{base}.to_add_out")
        return t

    def ff_tree(base: str) -> dict:
        return {
            "proj_in": _dense(sd, f"{base}.net.0.proj"),
            "proj_out": _dense(sd, f"{base}.net.2"),
        }

    for i in range(num_layers):
        base = f"transformer_blocks.{i}"
        pre_only = i == num_layers - 1
        blk = {
            "norm1": {"linear": _dense(sd, f"{base}.norm1.linear")},
            "norm1_context": {"linear": _dense(sd, f"{base}.norm1_context.linear")},
            "attn": attn_tree(f"{base}.attn", joint=True, pre_only=pre_only),
            "ff": ff_tree(f"{base}.ff"),
        }
        if not pre_only:
            blk["ff_context"] = ff_tree(f"{base}.ff_context")
        if i in dual_attention_layers:
            blk["attn2"] = attn_tree(f"{base}.attn2", joint=False, pre_only=False)
        p[f"transformer_blocks_{i}"] = blk

    return {"params": p}


# ---------------------------------------------------------------------------
# TPM (TPDM checkpoints: TPM-only safetensors, `agent_model.` prefix)
# ---------------------------------------------------------------------------


def convert_tpm(state_dict: Mapping, dtype=None) -> dict:
    """Accepts raw `time_predictor.*`, `agent_model.time_predictor.*`, or
    unprefixed TPM keys (the notebook strips `agent_model.`,
    reference: inference.ipynb cell 1)."""
    for prefix in ("agent_model.time_predictor.", "time_predictor.", ""):
        if any(k.startswith(prefix + "conv1.") for k in state_dict):
            break
    sd = _SD(state_dict, dtype, prefix=prefix)
    p = {
        "conv1": _conv(sd, "conv1"),
        "conv2": _conv(sd, "conv2"),
        "norm1": {
            "linear": _dense(sd, "norm1.linear"),
            "norm": _ln(sd, "norm1.norm"),
        },
        "fc1": _dense(sd, "fc1"),
        "fc2": _dense(sd, "fc2"),
    }
    return {"params": p}


def export_tpm(params: dict, prefix: str = "agent_model.time_predictor.") -> dict:
    """Inverse of convert_tpm: flax TPM params -> reference-layout state
    dict (for checkpoint interchange with the reference ecosystem).

    Outputs are C-contiguous — safetensors serializes raw buffers and
    silently corrupts transposed views otherwise."""
    p = params["params"]
    A = np.ascontiguousarray
    out = {
        f"{prefix}conv1.weight": A(np.asarray(p["conv1"]["kernel"]).transpose(3, 2, 0, 1)),
        f"{prefix}conv1.bias": A(np.asarray(p["conv1"]["bias"])),
        f"{prefix}conv2.weight": A(np.asarray(p["conv2"]["kernel"]).transpose(3, 2, 0, 1)),
        f"{prefix}conv2.bias": A(np.asarray(p["conv2"]["bias"])),
        f"{prefix}norm1.linear.weight": A(np.asarray(p["norm1"]["linear"]["kernel"]).T),
        f"{prefix}norm1.linear.bias": A(np.asarray(p["norm1"]["linear"]["bias"])),
        f"{prefix}norm1.norm.weight": A(np.asarray(p["norm1"]["norm"]["scale"])),
        f"{prefix}norm1.norm.bias": A(np.asarray(p["norm1"]["norm"]["bias"])),
        f"{prefix}fc1.weight": A(np.asarray(p["fc1"]["kernel"]).T),
        f"{prefix}fc1.bias": A(np.asarray(p["fc1"]["bias"])),
        f"{prefix}fc2.weight": A(np.asarray(p["fc2"]["kernel"]).T),
        f"{prefix}fc2.bias": A(np.asarray(p["fc2"]["bias"])),
    }
    return out


# ---------------------------------------------------------------------------
# SD3 VAE (diffusers AutoencoderKL)
# ---------------------------------------------------------------------------


def _resnet(sd: _SD, base: str, has_shortcut: bool) -> dict:
    t = {
        "norm1": _ln(sd, f"{base}.norm1"),
        "conv1": _conv(sd, f"{base}.conv1"),
        "norm2": _ln(sd, f"{base}.norm2"),
        "conv2": _conv(sd, f"{base}.conv2"),
    }
    if has_shortcut:
        t["conv_shortcut"] = _conv(sd, f"{base}.conv_shortcut")
    return t


def _vae_mid(sd: _SD, base: str) -> dict:
    return {
        "resnets_0": _resnet(sd, f"{base}.resnets.0", False),
        "attentions_0": {
            "group_norm": _ln(sd, f"{base}.attentions.0.group_norm"),
            "to_q": _dense(sd, f"{base}.attentions.0.to_q"),
            "to_k": _dense(sd, f"{base}.attentions.0.to_k"),
            "to_v": _dense(sd, f"{base}.attentions.0.to_v"),
            "to_out": _dense(sd, f"{base}.attentions.0.to_out.0"),
        },
        "resnets_1": _resnet(sd, f"{base}.resnets.1", False),
    }


def convert_vae(
    state_dict: Mapping,
    block_out_channels=(128, 256, 512, 512),
    layers_per_block: int = 2,
    dtype=None,
) -> dict:
    sd = _SD(state_dict, dtype)
    ch_up = list(reversed(block_out_channels))

    dec: dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_block": _vae_mid(sd, "decoder.mid_block"),
        "conv_norm_out": _ln(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    prev = ch_up[0]
    for i, out_ch in enumerate(ch_up):
        for j in range(layers_per_block + 1):
            in_ch = prev if j == 0 else out_ch
            dec[f"up_blocks_{i}_resnets_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", in_ch != out_ch
            )
        if i < len(ch_up) - 1:
            dec[f"up_blocks_{i}_upsamplers_0"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv"
            )
        prev = out_ch

    enc: dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_block": _vae_mid(sd, "encoder.mid_block"),
        "conv_norm_out": _ln(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    prev = block_out_channels[0]
    for i, out_ch in enumerate(block_out_channels):
        for j in range(layers_per_block):
            in_ch = prev if j == 0 else out_ch
            enc[f"down_blocks_{i}_resnets_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", in_ch != out_ch
            )
        if i < len(block_out_channels) - 1:
            enc[f"down_blocks_{i}_downsamplers_0"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
        prev = out_ch

    return {"params": {"decoder": dec, "encoder": enc}}


# ---------------------------------------------------------------------------
# SD1.5 UNet (diffusers UNet2DConditionModel <-> tpdm_tpu UNetSD15)
# ---------------------------------------------------------------------------


def _sd15_attn_tree(sd: _SD, base: str) -> dict:
    """Transformer2DModel: conv projections + one BasicTransformerBlock."""
    tb = f"{base}.transformer_blocks.0"
    block = {
        "norm1": _ln(sd, f"{tb}.norm1"),
        "norm2": _ln(sd, f"{tb}.norm2"),
        "norm3": _ln(sd, f"{tb}.norm3"),
        "ff_proj": _dense(sd, f"{tb}.ff.net.0.proj"),
        "ff_out": _dense(sd, f"{tb}.ff.net.2"),
    }
    for a in ("attn1", "attn2"):
        for proj in ("to_q", "to_k", "to_v"):
            block[f"{a}_{proj}"] = _dense(sd, f"{tb}.{a}.{proj}", bias=False)
        block[f"{a}_to_out"] = _dense(sd, f"{tb}.{a}.to_out.0")
    return {
        "norm": _ln(sd, f"{base}.norm"),
        "proj_in": _conv(sd, f"{base}.proj_in"),
        "block": block,
        "proj_out": _conv(sd, f"{base}.proj_out"),
    }


def _sd15_resnet_tree(sd: _SD, base: str) -> dict:
    out = {
        "norm1": _ln(sd, f"{base}.norm1"),
        "conv1": _conv(sd, f"{base}.conv1"),
        "time_emb_proj": _dense(sd, f"{base}.time_emb_proj"),
        "norm2": _ln(sd, f"{base}.norm2"),
        "conv2": _conv(sd, f"{base}.conv2"),
    }
    if sd.has(f"{base}.conv_shortcut.weight"):
        out["conv_shortcut"] = _conv(sd, f"{base}.conv_shortcut")
    return out


def convert_unet_sd15(
    state_dict: Mapping,
    block_out_channels=(320, 640, 1280, 1280),
    layers_per_block: int = 2,
    dtype=None,
) -> dict:
    """diffusers SD1.5 UNet2DConditionModel state dict -> UNetSD15 params.

    Layout parity with the reference fork (reference:
    src/models/stable_diffusion_v1_5/unet_sd_v1_5.py:71-1318 — 3
    CrossAttnDownBlock2D + DownBlock2D, mid UNetMidBlock2DCrossAttn,
    UpBlock2D + 3 CrossAttnUpBlock2D).
    """
    sd = _SD(state_dict, dtype)
    n = len(block_out_channels)
    p: dict = {
        "time_linear_1": _dense(sd, "time_embedding.linear_1"),
        "time_linear_2": _dense(sd, "time_embedding.linear_2"),
        "conv_in": _conv(sd, "conv_in"),
        "conv_norm_out": _ln(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_resnet_0": _sd15_resnet_tree(sd, "mid_block.resnets.0"),
        "mid_attn": _sd15_attn_tree(sd, "mid_block.attentions.0"),
        "mid_resnet_1": _sd15_resnet_tree(sd, "mid_block.resnets.1"),
    }
    for i in range(n):
        for j in range(layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _sd15_resnet_tree(
                sd, f"down_blocks.{i}.resnets.{j}"
            )
            if i < n - 1:  # CrossAttnDownBlock2D
                p[f"down_{i}_attn_{j}"] = _sd15_attn_tree(
                    sd, f"down_blocks.{i}.attentions.{j}"
                )
        if i < n - 1:
            p[f"down_{i}_downsample"] = _conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv"
            )
    for i in range(n):
        for j in range(layers_per_block + 1):
            p[f"up_{i}_resnet_{j}"] = _sd15_resnet_tree(
                sd, f"up_blocks.{i}.resnets.{j}"
            )
            if i > 0:  # CrossAttnUpBlock2D (up_blocks.0 is plain UpBlock2D)
                p[f"up_{i}_attn_{j}"] = _sd15_attn_tree(
                    sd, f"up_blocks.{i}.attentions.{j}"
                )
        if i < n - 1:
            p[f"up_{i}_upsample"] = _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
    return {"params": p}


def export_unet_sd15(params: dict) -> dict:
    """UNetSD15 params -> diffusers-layout SD1.5 UNet state dict (numpy)."""
    p = params["params"] if "params" in params else params
    out: dict = {}

    def dense(tree, key):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(tree["kernel"]).T)
        if "bias" in tree:
            out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(tree["bias"]))

    def conv(tree, key):
        out[f"{key}.weight"] = np.ascontiguousarray(
            np.asarray(tree["kernel"]).transpose(3, 2, 0, 1)
        )
        out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(tree["bias"]))

    def norm(tree, key):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(tree["scale"]))
        out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(tree["bias"]))

    def resnet(tree, base):
        norm(tree["norm1"], f"{base}.norm1")
        conv(tree["conv1"], f"{base}.conv1")
        dense(tree["time_emb_proj"], f"{base}.time_emb_proj")
        norm(tree["norm2"], f"{base}.norm2")
        conv(tree["conv2"], f"{base}.conv2")
        if "conv_shortcut" in tree:
            conv(tree["conv_shortcut"], f"{base}.conv_shortcut")

    def attn(tree, base):
        norm(tree["norm"], f"{base}.norm")
        conv(tree["proj_in"], f"{base}.proj_in")
        conv(tree["proj_out"], f"{base}.proj_out")
        tb = f"{base}.transformer_blocks.0"
        b = tree["block"]
        for nm in ("norm1", "norm2", "norm3"):
            norm(b[nm], f"{tb}.{nm}")
        for a in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                dense(b[f"{a}_{proj}"], f"{tb}.{a}.{proj}")
            dense(b[f"{a}_to_out"], f"{tb}.{a}.to_out.0")
        dense(b["ff_proj"], f"{tb}.ff.net.0.proj")
        dense(b["ff_out"], f"{tb}.ff.net.2")

    for name, tree in p.items():
        if name.startswith("time_linear_"):
            dense(tree, f"time_embedding.linear_{name[-1]}")
        elif name in ("conv_in", "conv_out"):
            conv(tree, name)
        elif name == "conv_norm_out":
            norm(tree, name)
        elif "_resnet_" in name:
            loc, _, j = name.rpartition("_")
            loc = loc.replace("_resnet", "")
            base = (
                f"mid_block.resnets.{j}"
                if loc == "mid"
                else f"{loc.split('_')[0]}_blocks.{loc.split('_')[1]}.resnets.{j}"
            )
            resnet(tree, base)
        elif name == "mid_attn":
            attn(tree, "mid_block.attentions.0")
        elif "_attn_" in name:
            loc, _, j = name.rpartition("_")
            loc = loc.replace("_attn", "")
            attn(tree, f"{loc.split('_')[0]}_blocks.{loc.split('_')[1]}.attentions.{j}")
        elif name.endswith("_downsample"):
            i = name.split("_")[1]
            conv(tree, f"down_blocks.{i}.downsamplers.0.conv")
        elif name.endswith("_upsample"):
            i = name.split("_")[1]
            conv(tree, f"up_blocks.{i}.upsamplers.0.conv")
        else:
            raise ValueError(f"unmapped UNetSD15 module: {name}")
    return out


# ---------------------------------------------------------------------------
# SDXL UNet (diffusers UNet2DConditionModel layout, use_linear_projection)
# ---------------------------------------------------------------------------


def _conv_any(sd: _SD, key: str) -> dict:
    """Conv params from either a 4D conv weight (O,I,H,W) or a 2D Linear
    weight (O,I) — SDXL's use_linear_projection Transformer2DModel stores
    proj_in/proj_out as Linear; a 1x1 NHWC conv is the identical map, so
    the Linear weight reshapes to kernel (1,1,I,O)."""
    w = sd(f"{key}.weight")
    if w.ndim == 2:
        kernel = np.ascontiguousarray(w.T[None, None])
    else:
        kernel = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    return {"kernel": kernel, "bias": sd(f"{key}.bias")}


def _sdxl_attn_tree(sd: _SD, base: str, depth: int) -> dict:
    """Transformer2DModel with `depth` BasicTransformerBlocks."""
    out = {
        "norm": _ln(sd, f"{base}.norm"),
        "proj_in": _conv_any(sd, f"{base}.proj_in"),
        "proj_out": _conv_any(sd, f"{base}.proj_out"),
    }
    for k in range(depth):
        tb = f"{base}.transformer_blocks.{k}"
        block = {
            "norm1": _ln(sd, f"{tb}.norm1"),
            "norm2": _ln(sd, f"{tb}.norm2"),
            "norm3": _ln(sd, f"{tb}.norm3"),
            "ff_proj": _dense(sd, f"{tb}.ff.net.0.proj"),
            "ff_out": _dense(sd, f"{tb}.ff.net.2"),
        }
        for a in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                block[f"{a}_{proj}"] = _dense(sd, f"{tb}.{a}.{proj}", bias=False)
            block[f"{a}_to_out"] = _dense(sd, f"{tb}.{a}.to_out.0")
        out["block" if depth == 1 else f"block_{k}"] = block
    return out


def convert_unet_sdxl(
    state_dict: Mapping,
    block_out_channels=(320, 640, 1280),
    layers_per_block: int = 2,
    transformer_layers_per_block=(0, 2, 10),
    mid_transformer_layers: int = 10,
    dtype=None,
) -> dict:
    """diffusers SDXL UNet2DConditionModel state dict -> UNetSD15 params
    (UNetConfig.sdxl()). Beyond-reference family: DownBlock2D +
    2x CrossAttnDownBlock2D with transformer depths (2, 10), text_time
    add_embedding, linear transformer projections."""
    sd = _SD(state_dict, dtype)
    n = len(block_out_channels)
    depths = tuple(transformer_layers_per_block)
    p: dict = {
        "time_linear_1": _dense(sd, "time_embedding.linear_1"),
        "time_linear_2": _dense(sd, "time_embedding.linear_2"),
        "add_linear_1": _dense(sd, "add_embedding.linear_1"),
        "add_linear_2": _dense(sd, "add_embedding.linear_2"),
        "conv_in": _conv(sd, "conv_in"),
        "conv_norm_out": _ln(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_resnet_0": _sd15_resnet_tree(sd, "mid_block.resnets.0"),
        "mid_attn": _sdxl_attn_tree(
            sd, "mid_block.attentions.0", mid_transformer_layers
        ),
        "mid_resnet_1": _sd15_resnet_tree(sd, "mid_block.resnets.1"),
    }
    for i in range(n):
        for j in range(layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _sd15_resnet_tree(
                sd, f"down_blocks.{i}.resnets.{j}"
            )
            if depths[i] > 0:
                p[f"down_{i}_attn_{j}"] = _sdxl_attn_tree(
                    sd, f"down_blocks.{i}.attentions.{j}", depths[i]
                )
        if i < n - 1:
            p[f"down_{i}_downsample"] = _conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv"
            )
    for i in range(n):
        depth_i = depths[n - 1 - i]
        for j in range(layers_per_block + 1):
            p[f"up_{i}_resnet_{j}"] = _sd15_resnet_tree(
                sd, f"up_blocks.{i}.resnets.{j}"
            )
            if depth_i > 0:
                p[f"up_{i}_attn_{j}"] = _sdxl_attn_tree(
                    sd, f"up_blocks.{i}.attentions.{j}", depth_i
                )
        if i < n - 1:
            p[f"up_{i}_upsample"] = _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
    return {"params": p}


def export_unet_sdxl(params: dict, linear_projection: bool = True) -> dict:
    """UNetSD15 (SDXL config) params -> diffusers-layout state dict (numpy).

    linear_projection=True writes Transformer2DModel proj_in/proj_out as
    2D Linear weights (diffusers SDXL convention)."""
    p = params["params"] if "params" in params else params
    out: dict = {}

    def dense(tree, key):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(tree["kernel"]).T)
        if "bias" in tree:
            out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(tree["bias"]))

    def conv(tree, key):
        out[f"{key}.weight"] = np.ascontiguousarray(
            np.asarray(tree["kernel"]).transpose(3, 2, 0, 1)
        )
        out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(tree["bias"]))

    def proj(tree, key):
        if linear_projection:
            k = np.asarray(tree["kernel"])  # (1,1,I,O)
            out[f"{key}.weight"] = np.ascontiguousarray(k[0, 0].T)
            out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(tree["bias"]))
        else:
            conv(tree, key)

    def norm(tree, key):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(tree["scale"]))
        out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(tree["bias"]))

    def resnet(tree, base):
        norm(tree["norm1"], f"{base}.norm1")
        conv(tree["conv1"], f"{base}.conv1")
        dense(tree["time_emb_proj"], f"{base}.time_emb_proj")
        norm(tree["norm2"], f"{base}.norm2")
        conv(tree["conv2"], f"{base}.conv2")
        if "conv_shortcut" in tree:
            conv(tree["conv_shortcut"], f"{base}.conv_shortcut")

    def attn(tree, base):
        norm(tree["norm"], f"{base}.norm")
        proj(tree["proj_in"], f"{base}.proj_in")
        proj(tree["proj_out"], f"{base}.proj_out")
        blocks = (
            [("block", 0)]
            if "block" in tree
            else sorted(
                ((k, int(k.rsplit("_", 1)[1])) for k in tree if k.startswith("block_")),
                key=lambda kv: kv[1],
            )
        )
        for name, k in blocks:
            tb = f"{base}.transformer_blocks.{k}"
            b = tree[name]
            for nm in ("norm1", "norm2", "norm3"):
                norm(b[nm], f"{tb}.{nm}")
            for a in ("attn1", "attn2"):
                for pj in ("to_q", "to_k", "to_v"):
                    dense(b[f"{a}_{pj}"], f"{tb}.{a}.{pj}")
                dense(b[f"{a}_to_out"], f"{tb}.{a}.to_out.0")
            dense(b["ff_proj"], f"{tb}.ff.net.0.proj")
            dense(b["ff_out"], f"{tb}.ff.net.2")

    for name, tree in p.items():
        if name.startswith("time_linear_"):
            dense(tree, f"time_embedding.linear_{name[-1]}")
        elif name.startswith("add_linear_"):
            dense(tree, f"add_embedding.linear_{name[-1]}")
        elif name in ("conv_in", "conv_out"):
            conv(tree, name)
        elif name == "conv_norm_out":
            norm(tree, name)
        elif "_resnet_" in name:
            loc, _, j = name.rpartition("_")
            loc = loc.replace("_resnet", "")
            base = (
                f"mid_block.resnets.{j}"
                if loc == "mid"
                else f"{loc.split('_')[0]}_blocks.{loc.split('_')[1]}.resnets.{j}"
            )
            resnet(tree, base)
        elif name == "mid_attn":
            attn(tree, "mid_block.attentions.0")
        elif "_attn_" in name:
            loc, _, j = name.rpartition("_")
            loc = loc.replace("_attn", "")
            attn(tree, f"{loc.split('_')[0]}_blocks.{loc.split('_')[1]}.attentions.{j}")
        elif name.endswith("_downsample"):
            i = name.split("_")[1]
            conv(tree, f"down_blocks.{i}.downsamplers.0.conv")
        elif name.endswith("_upsample"):
            i = name.split("_")[1]
            conv(tree, f"up_blocks.{i}.upsamplers.0.conv")
        else:
            raise ValueError(f"unmapped SDXL UNet module: {name}")
    return out


# ---------------------------------------------------------------------------
# FLUX transformer (BFL checkpoint layout: black-forest-labs flux.1 repos)
# ---------------------------------------------------------------------------


def convert_flux(
    state_dict: Mapping,
    depth_double: int = 19,
    depth_single: int = 38,
    dtype=None,
) -> dict:
    """BFL flux.1 transformer state dict -> tpdm_tpu Flux params.

    Key layout follows the official black-forest-labs checkpoints
    (img_in/txt_in/time_in/vector_in[/guidance_in], double_blocks.N with
    fused img_attn.qkv + query/key RMSNorm scales, single_blocks.N with
    fused linear1 = [qkv | mlp], final_layer.{adaLN_modulation.1,linear}).
    The fused qkv rows split into our per-projection Denses; everything
    else is a straight torch (out, in) -> flax (in, out) transpose. The
    reference repo names a FLUX variant but ships no code for it (SURVEY
    §2.1); this converter makes the beyond-reference FLUX backbone
    loadable from released weights.
    """
    sd = _SD(state_dict, dtype)

    def mlp_embed(base: str) -> dict:
        return {
            "in_layer": _dense(sd, f"{base}.in_layer"),
            "out_layer": _dense(sd, f"{base}.out_layer"),
        }

    def split_qkv(base: str, prefix: str) -> dict:
        w = sd(f"{base}.qkv.weight")  # (3d, d) torch layout
        b = sd(f"{base}.qkv.bias")
        d = w.shape[1]
        out = {}
        for j, nm in enumerate(("q", "k", "v")):
            out[f"{prefix}_to_{nm}"] = {
                "kernel": np.ascontiguousarray(w[j * d:(j + 1) * d].T),
                "bias": b[j * d:(j + 1) * d],
            }
        out[f"{prefix}_norm_q"] = {"scale": sd(f"{base}.norm.query_norm.scale")}
        out[f"{prefix}_norm_k"] = {"scale": sd(f"{base}.norm.key_norm.scale")}
        return out

    p: dict = {
        "img_in": _dense(sd, "img_in"),
        "txt_in": _dense(sd, "txt_in"),
        "time_in": mlp_embed("time_in"),
        "vector_in": mlp_embed("vector_in"),
        "final_mod": {"lin": _dense(sd, "final_layer.adaLN_modulation.1")},
        "final_proj": _dense(sd, "final_layer.linear"),
    }
    if sd.has("guidance_in.in_layer.weight"):
        p["guidance_in"] = mlp_embed("guidance_in")
    for i in range(depth_double):
        base = f"double_blocks.{i}"
        blk = {
            "img_mod": {"lin": _dense(sd, f"{base}.img_mod.lin")},
            "txt_mod": {"lin": _dense(sd, f"{base}.txt_mod.lin")},
            "img_attn_proj": _dense(sd, f"{base}.img_attn.proj"),
            "txt_attn_proj": _dense(sd, f"{base}.txt_attn.proj"),
            "img_mlp_0": _dense(sd, f"{base}.img_mlp.0"),
            "img_mlp_2": _dense(sd, f"{base}.img_mlp.2"),
            "txt_mlp_0": _dense(sd, f"{base}.txt_mlp.0"),
            "txt_mlp_2": _dense(sd, f"{base}.txt_mlp.2"),
        }
        blk.update(split_qkv(f"{base}.img_attn", "img_attn"))
        blk.update(split_qkv(f"{base}.txt_attn", "txt_attn"))
        p[f"double_blocks_{i}"] = blk
    for i in range(depth_single):
        base = f"single_blocks.{i}"
        p[f"single_blocks_{i}"] = {
            "modulation": {"lin": _dense(sd, f"{base}.modulation.lin")},
            "linear1": _dense(sd, f"{base}.linear1"),
            "linear2": _dense(sd, f"{base}.linear2"),
            "norm_q": {"scale": sd(f"{base}.norm.query_norm.scale")},
            "norm_k": {"scale": sd(f"{base}.norm.key_norm.scale")},
        }
    return {"params": p}


def export_flux(params: dict) -> dict:
    """tpdm_tpu Flux params -> BFL-layout state dict (inverse of
    convert_flux; safetensors-safe contiguity)."""
    tree = params["params"]
    out: dict = {}

    def dense(sub: dict, key: str):
        out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(sub["kernel"]).T)
        if "bias" in sub:
            out[f"{key}.bias"] = np.ascontiguousarray(np.asarray(sub["bias"]))

    def mlp_embed(sub: dict, base: str):
        dense(sub["in_layer"], f"{base}.in_layer")
        dense(sub["out_layer"], f"{base}.out_layer")

    def fuse_qkv(blk: dict, prefix: str, base: str):
        w = np.concatenate(
            [np.asarray(blk[f"{prefix}_to_{nm}"]["kernel"]).T for nm in ("q", "k", "v")]
        )
        b = np.concatenate(
            [np.asarray(blk[f"{prefix}_to_{nm}"]["bias"]) for nm in ("q", "k", "v")]
        )
        out[f"{base}.qkv.weight"] = np.ascontiguousarray(w)
        out[f"{base}.qkv.bias"] = np.ascontiguousarray(b)
        out[f"{base}.norm.query_norm.scale"] = np.ascontiguousarray(
            np.asarray(blk[f"{prefix}_norm_q"]["scale"])
        )
        out[f"{base}.norm.key_norm.scale"] = np.ascontiguousarray(
            np.asarray(blk[f"{prefix}_norm_k"]["scale"])
        )

    dense(tree["img_in"], "img_in")
    dense(tree["txt_in"], "txt_in")
    mlp_embed(tree["time_in"], "time_in")
    mlp_embed(tree["vector_in"], "vector_in")
    if "guidance_in" in tree:
        mlp_embed(tree["guidance_in"], "guidance_in")
    dense(tree["final_mod"]["lin"], "final_layer.adaLN_modulation.1")
    dense(tree["final_proj"], "final_layer.linear")
    for name, blk in tree.items():
        if name.startswith("double_blocks_"):
            i = name.split("_")[-1]
            base = f"double_blocks.{i}"
            dense(blk["img_mod"]["lin"], f"{base}.img_mod.lin")
            dense(blk["txt_mod"]["lin"], f"{base}.txt_mod.lin")
            dense(blk["img_attn_proj"], f"{base}.img_attn.proj")
            dense(blk["txt_attn_proj"], f"{base}.txt_attn.proj")
            dense(blk["img_mlp_0"], f"{base}.img_mlp.0")
            dense(blk["img_mlp_2"], f"{base}.img_mlp.2")
            dense(blk["txt_mlp_0"], f"{base}.txt_mlp.0")
            dense(blk["txt_mlp_2"], f"{base}.txt_mlp.2")
            fuse_qkv(blk, "img_attn", f"{base}.img_attn")
            fuse_qkv(blk, "txt_attn", f"{base}.txt_attn")
        elif name.startswith("single_blocks_"):
            i = name.split("_")[-1]
            base = f"single_blocks.{i}"
            dense(blk["modulation"]["lin"], f"{base}.modulation.lin")
            dense(blk["linear1"], f"{base}.linear1")
            dense(blk["linear2"], f"{base}.linear2")
            out[f"{base}.norm.query_norm.scale"] = np.ascontiguousarray(
                np.asarray(blk["norm_q"]["scale"])
            )
            out[f"{base}.norm.key_norm.scale"] = np.ascontiguousarray(
                np.asarray(blk["norm_k"]["scale"])
            )
        elif name in ("img_in", "txt_in", "time_in", "vector_in",
                      "guidance_in", "final_mod", "final_proj"):
            pass  # handled explicitly above
        else:
            raise ValueError(f"unmapped Flux module: {name}")
    return out
