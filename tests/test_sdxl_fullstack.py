"""Full-UNet SDXL oracle: flax forward vs an independent torch re-derivation.

tests/test_sdxl.py pins topology/gating structure and converter
round-trips; THIS test pins the XL-specific numerics — text_time addition
embedding (six sinusoid time-ids + pooled MLP summed into temb),
per-level transformer depth wiring ((0,1,2)-style with an attention-free
first level), per-level head derivation (heads = channels //
attention_head_dim), linear Transformer2DModel projections — against a
torch functional UNet written directly from the diffusers SDXL semantics
(the same fork pattern the reference applies to SD1.5,
reference: src/models/stable_diffusion_v1_5/unet_sd_v1_5.py:71-1318).
Weights flow through export_unet_sdxl, so the linear-projection converter
keys are exercised end to end.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15  # noqa: E402
from tpdm_tpu.utils.convert import export_unet_sdxl  # noqa: E402


def _sinusoid(t, dim, DT):
    """diffusers Timesteps: flip_sin_to_cos=True, freq_shift=0."""
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=DT) / half
    freqs = torch.exp(exponent)
    arg = t[:, None] * freqs[None, :]
    return torch.cat([torch.cos(arg), torch.sin(arg)], dim=-1)


def _torch_unet_xl(sd, cfg: UNetConfig, latents, timestep, ctx, added):
    DT = torch.float64
    P = {k: torch.tensor(np.asarray(v), dtype=DT) for k, v in sd.items()}

    def conv(x, base, stride=1, pad=1):
        return F.conv2d(x, P[f"{base}.weight"], P[f"{base}.bias"],
                        stride=stride, padding=pad)

    def lin(x, base):
        return F.linear(x, P[f"{base}.weight"], P.get(f"{base}.bias"))

    def gn(x, base, groups, eps):
        return F.group_norm(x, groups, P[f"{base}.weight"], P[f"{base}.bias"],
                            eps=eps)

    def ln(x, base):
        return F.layer_norm(x, x.shape[-1:], P[f"{base}.weight"],
                            P[f"{base}.bias"], eps=1e-5)

    g = cfg.norm_num_groups

    def resnet(x, temb, base):
        h = F.silu(gn(x, f"{base}.norm1", g, 1e-5))
        h = conv(h, f"{base}.conv1")
        t = lin(F.silu(temb), f"{base}.time_emb_proj")
        h = h + t[:, :, None, None]
        h = F.silu(gn(h, f"{base}.norm2", g, 1e-5))
        h = conv(h, f"{base}.conv2")
        if f"{base}.conv_shortcut.weight" in P:
            x = F.conv2d(x, P[f"{base}.conv_shortcut.weight"],
                         P[f"{base}.conv_shortcut.bias"])
        return x + h

    def mha(x, y, base, heads):
        b, n, d = x.shape
        m = y.shape[1]
        hd = d // heads
        q = lin(x, f"{base}.to_q").reshape(b, n, heads, hd).permute(0, 2, 1, 3)
        k = lin(y, f"{base}.to_k").reshape(b, m, heads, hd).permute(0, 2, 1, 3)
        v = lin(y, f"{base}.to_v").reshape(b, m, heads, hd).permute(0, 2, 1, 3)
        p = torch.softmax(q @ k.transpose(-1, -2) * hd**-0.5, dim=-1)
        o = (p @ v).permute(0, 2, 1, 3).reshape(b, n, d)
        return lin(o, f"{base}.to_out.0")

    def spatial_transformer(x, base, dim, depth):
        """use_linear_projection=True: norm -> tokens -> Linear proj_in,
        `depth` BasicTransformerBlocks, Linear proj_out -> residual —
        the diffusers SDXL Transformer2DModel path."""
        b, c, hh, ww = x.shape
        heads = dim // cfg.attention_head_dim
        res = x
        h = gn(x, f"{base}.norm", g, 1e-6)
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = lin(h, f"{base}.proj_in")
        for k in range(depth):
            tb = f"{base}.transformer_blocks.{k}"
            h = h + mha(ln(h, f"{tb}.norm1"), ln(h, f"{tb}.norm1"),
                        f"{tb}.attn1", heads)
            h = h + mha(ln(h, f"{tb}.norm2"), ctx_t, f"{tb}.attn2", heads)
            y = ln(h, f"{tb}.norm3")
            gate = lin(y, f"{tb}.ff.net.0.proj")
            a, gt = gate.chunk(2, dim=-1)
            y = a * F.gelu(gt)
            h = h + lin(y, f"{tb}.ff.net.2")
        h = lin(h, f"{base}.proj_out")
        h = h.reshape(b, hh, ww, dim).permute(0, 3, 1, 2)
        return h + res

    x = torch.tensor(np.asarray(latents), dtype=DT)
    ctx_t = torch.tensor(np.asarray(ctx), dtype=DT)
    t = torch.tensor(np.asarray(timestep), dtype=DT)

    t_feat = _sinusoid(t, cfg.block_out_channels[0], DT)
    temb = lin(t_feat, "time_embedding.linear_1")
    temb = lin(F.silu(temb), "time_embedding.linear_2")

    # text_time addition embedding: concat([pooled_text,
    # sinusoid(time_ids flattened)]) -> 2-layer MLP -> summed into temb
    # (diffusers UNet2DConditionModel get_aug_embed, addition_embed_type
    # "text_time")
    pooled = torch.tensor(np.asarray(added["text_embeds"]), dtype=DT)
    time_ids = torch.tensor(np.asarray(added["time_ids"]), dtype=DT)
    b = pooled.shape[0]
    t6 = _sinusoid(
        time_ids.reshape(-1), cfg.addition_time_embed_dim, DT
    ).reshape(b, cfg.num_time_ids * cfg.addition_time_embed_dim)
    aug = lin(torch.cat([pooled, t6], dim=-1), "add_embedding.linear_1")
    aug = lin(F.silu(aug), "add_embedding.linear_2")
    temb = temb + aug

    x = conv(x, "conv_in")
    h1 = x.clone()

    ch = cfg.block_out_channels
    depths = cfg.depths
    skips = [x]
    for i in range(len(ch)):
        is_last = i == len(ch) - 1
        for j in range(cfg.layers_per_block):
            x = resnet(x, temb, f"down_blocks.{i}.resnets.{j}")
            if depths[i] > 0:
                x = spatial_transformer(
                    x, f"down_blocks.{i}.attentions.{j}", ch[i], depths[i]
                )
            skips.append(x)
        if not is_last:
            x = conv(x, f"down_blocks.{i}.downsamplers.0.conv", stride=2)
            skips.append(x)

    x = resnet(x, temb, "mid_block.resnets.0")
    x = spatial_transformer(
        x, "mid_block.attentions.0", ch[-1], cfg.mid_transformer_layers
    )
    x = resnet(x, temb, "mid_block.resnets.1")

    for i, out_ch in enumerate(reversed(ch)):
        depth_i = depths[len(ch) - 1 - i]
        for j in range(cfg.layers_per_block + 1):
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb, f"up_blocks.{i}.resnets.{j}")
            if depth_i > 0:
                x = spatial_transformer(
                    x, f"up_blocks.{i}.attentions.{j}", out_ch, depth_i
                )
        if i < len(ch) - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = conv(x, f"up_blocks.{i}.upsamplers.0.conv")

    x = F.silu(gn(x, "conv_norm_out", g, 1e-5))
    h2 = x.clone()
    x = conv(x, "conv_out")
    return (x.numpy(), t_feat.numpy(), h1.numpy(), h2.numpy())


class TestSDXLFullStackOracle:
    @pytest.fixture(scope="class")
    def world(self):
        cfg = UNetConfig.toy_xl()
        unet = UNetSD15(cfg)
        key = jax.random.PRNGKey(5)
        b, n_ctx = 2, 5
        latents = jax.random.normal(
            jax.random.fold_in(key, 1),
            (b, 4, cfg.sample_size, cfg.sample_size),
        )
        timestep = jnp.array([2.5, 871.0])
        ctx = jax.random.normal(
            jax.random.fold_in(key, 2), (b, n_ctx, cfg.cross_attention_dim)
        )
        added = {
            "text_embeds": jax.random.normal(
                jax.random.fold_in(key, 3), (b, cfg.addition_pooled_dim)
            ),
            # realistic size/crop ids: mixed magnitudes incl. zeros
            "time_ids": jnp.asarray(
                [[128.0, 128.0, 0.0, 0.0, 128.0, 128.0],
                 [96.0, 64.0, 16.0, 8.0, 128.0, 128.0]]
            ),
        }
        params = unet.init(key, latents, timestep, ctx, added)
        params = jax.tree.map(
            lambda x: x + 0.01 * jax.random.normal(
                jax.random.fold_in(key, x.size % 977), x.shape, x.dtype
            ),
            params,
        )
        return cfg, unet, params, latents, timestep, ctx, added

    def test_full_forward_matches_torch(self, world):
        cfg, unet, params, latents, timestep, ctx, added = world
        ours = unet.apply(params, latents, timestep, ctx, added)
        sd = export_unet_sdxl(params)
        want = _torch_unet_xl(sd, cfg, latents, timestep, ctx, added)
        names = ("noise_pred", "t_feat", "h1", "h2")
        for name, a, b_ in zip(names, ours, want):
            a = np.asarray(a, np.float64)
            denom = np.abs(b_).max() + 1e-12
            rel = np.abs(a - b_).max() / denom
            assert rel < 2e-5, f"{name}: max rel err {rel:.2e}"

    def test_addition_embed_is_live(self, world):
        """time_ids and pooled text must actually steer the prediction —
        a regression that drops the aug path would still pass shape
        checks."""
        cfg, unet, params, latents, timestep, ctx, added = world
        eps_a, *_ = unet.apply(params, latents, timestep, ctx, added)
        moved = {
            "text_embeds": added["text_embeds"] + 1.0,
            "time_ids": added["time_ids"],
        }
        eps_b, *_ = unet.apply(params, latents, timestep, ctx, moved)
        assert float(jnp.abs(eps_a - eps_b).max()) > 1e-6
        moved = {
            "text_embeds": added["text_embeds"],
            "time_ids": added["time_ids"] * 0.5,
        }
        eps_c, *_ = unet.apply(params, latents, timestep, ctx, moved)
        assert float(jnp.abs(eps_a - eps_c).max()) > 1e-6
