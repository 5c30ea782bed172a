"""Full VAE-decoder parity: torch oracle over a diffusers-layout state dict.

Validates convert_vae's key mapping and the decoder assembly (mid block,
up-block ordering, upsample placement) against a faithful torch
re-implementation of diffusers' Decoder forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tpdm_tpu.models.vae import VAE, VAEConfig
from tpdm_tpu.utils.convert import convert_vae


def _synth_vae_sd(cfg: VAEConfig, seed=0):
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, i, o, k=3):
        sd[f"{name}.weight"] = (rng.normal(size=(o, i, k, k)) * 0.08).astype(np.float32)
        sd[f"{name}.bias"] = (rng.normal(size=(o,)) * 0.05).astype(np.float32)

    def gn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = (rng.normal(size=(c,)) * 0.1).astype(np.float32)

    def lin(name, i, o):
        sd[f"{name}.weight"] = (rng.normal(size=(o, i)) * 0.08).astype(np.float32)
        sd[f"{name}.bias"] = (rng.normal(size=(o,)) * 0.05).astype(np.float32)

    def resnet(base, i, o):
        gn(f"{base}.norm1", i)
        conv(f"{base}.conv1", i, o)
        gn(f"{base}.norm2", o)
        conv(f"{base}.conv2", o, o)
        if i != o:
            conv(f"{base}.conv_shortcut", i, o, k=1)

    ch = list(reversed(cfg.block_out_channels))
    conv("decoder.conv_in", cfg.latent_channels, ch[0])
    resnet("decoder.mid_block.resnets.0", ch[0], ch[0])
    gn("decoder.mid_block.attentions.0.group_norm", ch[0])
    for nm in ("to_q", "to_k", "to_v"):
        lin(f"decoder.mid_block.attentions.0.{nm}", ch[0], ch[0])
    lin("decoder.mid_block.attentions.0.to_out.0", ch[0], ch[0])
    resnet("decoder.mid_block.resnets.1", ch[0], ch[0])
    prev = ch[0]
    for bi, out_ch in enumerate(ch):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{bi}.resnets.{j}", prev if j == 0 else out_ch, out_ch)
        if bi < len(ch) - 1:
            conv(f"decoder.up_blocks.{bi}.upsamplers.0.conv", out_ch, out_ch)
        prev = out_ch
    gn("decoder.conv_norm_out", ch[-1])
    conv("decoder.conv_out", ch[-1], cfg.out_channels)

    # minimal encoder keys so convert_vae doesn't fail
    conv("encoder.conv_in", cfg.in_channels, cfg.block_out_channels[0])
    prev = cfg.block_out_channels[0]
    for bi, out_ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{bi}.resnets.{j}", prev if j == 0 else out_ch, out_ch)
        if bi < len(cfg.block_out_channels) - 1:
            conv(f"encoder.down_blocks.{bi}.downsamplers.0.conv", out_ch, out_ch)
        prev = out_ch
    c_last = cfg.block_out_channels[-1]
    resnet("encoder.mid_block.resnets.0", c_last, c_last)
    gn("encoder.mid_block.attentions.0.group_norm", c_last)
    for nm in ("to_q", "to_k", "to_v"):
        lin(f"encoder.mid_block.attentions.0.{nm}", c_last, c_last)
    lin("encoder.mid_block.attentions.0.to_out.0", c_last, c_last)
    resnet("encoder.mid_block.resnets.1", c_last, c_last)
    gn("encoder.conv_norm_out", c_last)
    conv("encoder.conv_out", c_last, 2 * cfg.latent_channels)
    return sd


def _torch_decode(sd, cfg: VAEConfig, z):
    T = lambda k: torch.tensor(sd[k])
    g = cfg.norm_num_groups

    def conv(x, name, stride=1):
        w = T(f"{name}.weight")
        pad = (w.shape[-1] - 1) // 2
        return F.conv2d(x, w, T(f"{name}.bias"), stride=stride, padding=pad)

    def gn_(x, name):
        return F.group_norm(x, g, T(f"{name}.weight"), T(f"{name}.bias"), eps=1e-6)

    def resnet(x, base):
        h = conv(F.silu(gn_(x, f"{base}.norm1")), f"{base}.conv1")
        h = conv(F.silu(gn_(h, f"{base}.norm2")), f"{base}.conv2")
        if f"{base}.conv_shortcut.weight" in sd:
            x = conv(x, f"{base}.conv_shortcut")
        return x + h

    def attn(x, base):
        b, c, hh, ww = x.shape
        h_ = gn_(x, f"{base}.group_norm").permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        lin = lambda t, nm: t @ T(f"{base}.{nm}.weight").t() + T(f"{base}.{nm}.bias")
        q, k, v = lin(h_, "to_q"), lin(h_, "to_k"), lin(h_, "to_v")
        o = F.scaled_dot_product_attention(q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)).squeeze(1)
        o = lin(o, "to_out.0").reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        return x + o

    x = conv(torch.tensor(z), "decoder.conv_in")
    x = resnet(x, "decoder.mid_block.resnets.0")
    x = attn(x, "decoder.mid_block.attentions.0")
    x = resnet(x, "decoder.mid_block.resnets.1")
    ch = list(reversed(cfg.block_out_channels))
    for bi in range(len(ch)):
        for j in range(cfg.layers_per_block + 1):
            x = resnet(x, f"decoder.up_blocks.{bi}.resnets.{j}")
        if bi < len(ch) - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = conv(x, f"decoder.up_blocks.{bi}.upsamplers.0.conv")
    x = F.silu(gn_(x, "decoder.conv_norm_out"))
    return conv(x, "decoder.conv_out")


class TestFullVAEDecoderOracle:
    def test_converted_checkpoint_matches_torch(self):
        cfg = VAEConfig.toy(block_out_channels=(8, 12, 16))
        sd = _synth_vae_sd(cfg)
        params = convert_vae(
            sd, block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
        )
        vae = VAE(cfg)
        z = np.random.default_rng(1).normal(size=(2, cfg.latent_channels, 4, 4)).astype(np.float32)
        ours = vae.apply(params, jnp.array(z))
        ref = _torch_decode(sd, cfg, z)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-3, atol=2e-3)
