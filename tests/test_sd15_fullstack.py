"""Full-UNet SD1.5 oracle: flax forward vs an independent torch re-derivation.

The block-level oracles (tests/test_sd15.py) pin each module; this test pins
the WHOLE forward — skip-connection order, down/up topology, eps values,
h1/h2 tap placement — against a torch functional UNet written directly from
the diffusers semantics the reference forks
(reference: src/models/stable_diffusion_v1_5/unet_sd_v1_5.py:1100-1316).
Weights flow through our own exporter (export_unet_sd15), so the converter's
diffusers-layout keys are exercised end to end too.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15  # noqa: E402
from tpdm_tpu.utils.convert import export_unet_sd15  # noqa: E402


# ---------------------------------------------------------------------------
# independent torch functional UNet over a diffusers-layout state dict
# ---------------------------------------------------------------------------
def _torch_unet(sd, cfg: UNetConfig, latents, timestep, ctx):
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

    def spatial_transformer(x, base, dim):
        b, c, hh, ww = x.shape
        res = x
        h = gn(x, f"{base}.norm", g, 1e-6)  # Transformer2DModel eps
        h = F.conv2d(h, P[f"{base}.proj_in.weight"], P[f"{base}.proj_in.bias"])
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, dim)
        tb = f"{base}.transformer_blocks.0"
        h = h + mha(ln(h, f"{tb}.norm1"), ln(h, f"{tb}.norm1"), f"{tb}.attn1",
                    cfg.num_attention_heads)
        h = h + mha(ln(h, f"{tb}.norm2"), ctx_t, f"{tb}.attn2",
                    cfg.num_attention_heads)
        y = ln(h, f"{tb}.norm3")
        gate = lin(y, f"{tb}.ff.net.0.proj")
        a, gt = gate.chunk(2, dim=-1)
        y = a * F.gelu(gt)
        h = h + lin(y, f"{tb}.ff.net.2")
        h = h.reshape(b, hh, ww, dim).permute(0, 3, 1, 2)
        h = F.conv2d(h, P[f"{base}.proj_out.weight"], P[f"{base}.proj_out.bias"])
        return h + res

    x = torch.tensor(np.asarray(latents), dtype=DT)
    ctx_t = torch.tensor(np.asarray(ctx), dtype=DT)
    t = torch.tensor(np.asarray(timestep), dtype=DT)

    # diffusers Timesteps: flip_sin_to_cos=True, freq_shift=0
    half = cfg.block_out_channels[0] // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=DT) / half
    freqs = torch.exp(exponent)
    arg = t[:, None] * freqs[None, :]
    t_feat = torch.cat([torch.cos(arg), torch.sin(arg)], dim=-1)

    temb = lin(t_feat, "time_embedding.linear_1")
    temb = lin(F.silu(temb), "time_embedding.linear_2")

    x = conv(x, "conv_in")
    h1 = x.clone()

    ch = cfg.block_out_channels
    skips = [x]
    for i in range(len(ch)):
        is_last = i == len(ch) - 1
        for j in range(cfg.layers_per_block):
            x = resnet(x, temb, f"down_blocks.{i}.resnets.{j}")
            if not is_last:
                x = spatial_transformer(
                    x, f"down_blocks.{i}.attentions.{j}", ch[i]
                )
            skips.append(x)
        if not is_last:
            x = conv(x, f"down_blocks.{i}.downsamplers.0.conv", stride=2)
            skips.append(x)

    x = resnet(x, temb, "mid_block.resnets.0")
    x = spatial_transformer(x, "mid_block.attentions.0", ch[-1])
    x = resnet(x, temb, "mid_block.resnets.1")

    for i, out_ch in enumerate(reversed(ch)):
        for j in range(cfg.layers_per_block + 1):
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb, f"up_blocks.{i}.resnets.{j}")
            if i != 0:
                x = spatial_transformer(x, f"up_blocks.{i}.attentions.{j}",
                                        out_ch)
        if i < len(ch) - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = conv(x, f"up_blocks.{i}.upsamplers.0.conv")

    x = F.silu(gn(x, "conv_norm_out", g, 1e-5))
    h2 = x.clone()
    x = conv(x, "conv_out")
    return (x.numpy(), t_feat.numpy(), h1.numpy(), h2.numpy())


class TestSD15FullStackOracle:
    @pytest.fixture(scope="class")
    def world(self):
        cfg = UNetConfig.toy()
        unet = UNetSD15(cfg)
        key = jax.random.PRNGKey(3)
        b, n_ctx = 2, 5
        latents = jax.random.normal(
            jax.random.fold_in(key, 1), (b, 4, cfg.sample_size, cfg.sample_size)
        )
        timestep = jnp.array([2.5, 871.0])
        ctx = jax.random.normal(
            jax.random.fold_in(key, 2), (b, n_ctx, cfg.cross_attention_dim)
        )
        params = unet.init(key, latents, timestep, ctx)
        # non-degenerate weights: init then perturb biases so silu/GN paths
        # don't sit at zero
        params = jax.tree.map(
            lambda x: x + 0.01 * jax.random.normal(
                jax.random.fold_in(key, x.size % 977), x.shape, x.dtype
            ),
            params,
        )
        return cfg, unet, params, latents, timestep, ctx

    def test_full_forward_matches_torch(self, world):
        cfg, unet, params, latents, timestep, ctx = world
        ours = unet.apply(params, latents, timestep, ctx)
        sd = export_unet_sd15(params)
        want = _torch_unet(sd, cfg, latents, timestep, ctx)
        names = ("noise_pred", "t_feat", "h1", "h2")
        for name, a, b_ in zip(names, ours, want):
            a = np.asarray(a, np.float64)
            denom = np.abs(b_).max() + 1e-12
            rel = np.abs(a - b_).max() / denom
            assert rel < 2e-5, f"{name}: max rel err {rel:.2e}"

    def test_taps_are_live(self, world):
        # h1/h2 must react to the latent input (tap placement sanity)
        cfg, unet, params, latents, timestep, ctx = world
        _, _, h1a, h2a = unet.apply(params, latents, timestep, ctx)
        _, _, h1b, h2b = unet.apply(params, latents + 1.0, timestep, ctx)
        assert float(jnp.abs(h1a - h1b).max()) > 0
        assert float(jnp.abs(h2a - h2b).max()) > 0
