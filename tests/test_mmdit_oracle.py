"""Full-model MMDiT parity: torch oracle over a diffusers-layout state dict.

The oracle implements the diffusers SD3Transformer2DModel forward (the
architecture the reference forks, reference: transformer_sd3.py:299-409)
directly with torch.nn.functional, consuming a synthetic checkpoint in the
DIFFUSERS key layout. The same state dict goes through `convert_mmdit` into
our flax MMDiT. Agreement validates the converter's key/layout mapping AND
the end-to-end architecture assembly (block wiring, AdaLN chunk orders,
joint-attention concat order, unpatchify einsum) in one shot.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tpdm_tpu.models.mmdit import MMDiT, MMDiTConfig
from tpdm_tpu.utils.convert import convert_mmdit


def _synth_state_dict(cfg: MMDiTConfig, seed=0):
    """Random diffusers-layout state dict for the given config."""
    rng = np.random.default_rng(seed)
    d = cfg.inner_dim
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = (rng.normal(size=(o, i)) * 0.05).astype(np.float32)
        sd[f"{name}.bias"] = (rng.normal(size=(o,)) * 0.05).astype(np.float32)

    sd["pos_embed.proj.weight"] = (
        rng.normal(size=(d, cfg.in_channels, cfg.patch_size, cfg.patch_size)) * 0.05
    ).astype(np.float32)
    sd["pos_embed.proj.bias"] = (rng.normal(size=(d,)) * 0.05).astype(np.float32)
    lin("time_text_embed.timestep_embedder.linear_1", 256, d)
    lin("time_text_embed.timestep_embedder.linear_2", d, d)
    lin("time_text_embed.text_embedder.linear_1", cfg.pooled_projection_dim, d)
    lin("time_text_embed.text_embedder.linear_2", d, d)
    lin("context_embedder", cfg.joint_attention_dim, d)
    lin("norm_out.linear", d, 2 * d)
    lin("proj_out", d, cfg.patch_size**2 * cfg.out_channels)

    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        pre_only = i == cfg.num_layers - 1
        lin(f"{b}.norm1.linear", d, 6 * d)
        lin(f"{b}.norm1_context.linear", d, 2 * d if pre_only else 6 * d)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{b}.attn.{nm}", d, d)
        lin(f"{b}.attn.to_out.0", d, d)
        if not pre_only:
            lin(f"{b}.attn.to_add_out", d, d)
        lin(f"{b}.ff.net.0.proj", d, 4 * d)
        lin(f"{b}.ff.net.2", 4 * d, d)
        if not pre_only:
            lin(f"{b}.ff_context.net.0.proj", d, 4 * d)
            lin(f"{b}.ff_context.net.2", 4 * d, d)
    return sd


def _torch_mmdit_forward(sd, cfg: MMDiTConfig, latents, timestep, ctx_in, pooled):
    """diffusers-faithful forward in torch.nn.functional."""
    d = cfg.inner_dim
    h = cfg.num_attention_heads
    hd = cfg.attention_head_dim
    p = cfg.patch_size

    T = lambda k: torch.tensor(sd[k])

    def lin(x, name):
        return x @ T(f"{name}.weight").t() + T(f"{name}.bias")

    def ln(x):
        return F.layer_norm(x, (x.shape[-1],), eps=1e-6)

    lat = torch.tensor(latents)
    bsz, c, hh, ww = lat.shape
    # PatchEmbed: conv k=p s=p + cropped sincos table
    x = F.conv2d(lat, T("pos_embed.proj.weight"), T("pos_embed.proj.bias"), stride=p)
    x = x.flatten(2).transpose(1, 2)  # (b, n, d)
    gh, gw = hh // p, ww // p

    # sincos table (diffusers get_2d_sincos_pos_embed), crop center
    m = cfg.pos_embed_max_size
    base = cfg.sample_size // p
    grid = np.arange(m, dtype=np.float64) / (m / base)
    gw_, gh_ = np.meshgrid(grid, grid)  # w first

    def emb1d(dim, pos):
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], 1)

    table = np.concatenate([emb1d(d // 2, gw_), emb1d(d // 2, gh_)], 1).astype(np.float32)
    table = table.reshape(m, m, d)
    top, left = (m - gh) // 2, (m - gw) // 2
    pos_crop = table[top : top + gh, left : left + gw].reshape(1, gh * gw, d)
    x = x + torch.tensor(pos_crop)

    # CombinedTimestepTextProjEmbeddings
    t = torch.tensor(timestep)
    half = 128
    expo = torch.exp(-math.log(10000) * torch.arange(half) / half)
    ang = t[:, None].float() * expo[None]
    t_feat = torch.cat([torch.sin(ang), torch.cos(ang)], -1)
    t_feat = torch.cat([t_feat[:, half:], t_feat[:, :half]], -1)  # flip
    temb = lin(
        F.silu(lin(t_feat, "time_text_embed.timestep_embedder.linear_1")),
        "time_text_embed.timestep_embedder.linear_2",
    )
    pooled_t = torch.tensor(pooled)
    temb = temb + lin(
        F.silu(lin(pooled_t, "time_text_embed.text_embedder.linear_1")),
        "time_text_embed.text_embedder.linear_2",
    )

    ctx = lin(torch.tensor(ctx_in), "context_embedder")

    def attn(xq, cq, base, pre_only):
        def heads(t_):
            b_, n_, _ = t_.shape
            return t_.view(b_, n_, h, hd).transpose(1, 2)

        q = heads(lin(xq, f"{base}.to_q"))
        k = heads(lin(xq, f"{base}.to_k"))
        v = heads(lin(xq, f"{base}.to_v"))
        qc = heads(lin(cq, f"{base}.add_q_proj"))
        kc = heads(lin(cq, f"{base}.add_k_proj"))
        vc = heads(lin(cq, f"{base}.add_v_proj"))
        q = torch.cat([q, qc], dim=2)
        k = torch.cat([k, kc], dim=2)
        v = torch.cat([v, vc], dim=2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(q.shape[0], -1, d)
        n_img = xq.shape[1]
        o_img, o_ctx = o[:, :n_img], o[:, n_img:]
        o_img = lin(o_img, f"{base}.to_out.0")
        o_ctx = None if pre_only else lin(o_ctx, f"{base}.to_add_out")
        return o_img, o_ctx

    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        pre_only = i == cfg.num_layers - 1
        mod = lin(F.silu(temb), f"{b}.norm1.linear")
        sh, sc, g1, sh_m, sc_m, g_m = mod.chunk(6, dim=1)
        nx = ln(x) * (1 + sc[:, None]) + sh[:, None]

        if pre_only:
            cmod = lin(F.silu(temb), f"{b}.norm1_context.linear")
            csc, csh = cmod.chunk(2, dim=1)  # AdaLN-continuous: scale first
            nc = ln(ctx) * (1 + csc[:, None]) + csh[:, None]
        else:
            cmod = lin(F.silu(temb), f"{b}.norm1_context.linear")
            c_sh, c_sc, c_g1, c_sh_m, c_sc_m, c_g_m = cmod.chunk(6, dim=1)
            nc = ln(ctx) * (1 + c_sc[:, None]) + c_sh[:, None]

        o_img, o_ctx = attn(nx, nc, f"{b}.attn", pre_only)
        x = x + g1[:, None] * o_img
        nx2 = ln(x) * (1 + sc_m[:, None]) + sh_m[:, None]
        ff = lin(F.gelu(lin(nx2, f"{b}.ff.net.0.proj"), approximate="tanh"), f"{b}.ff.net.2")
        x = x + g_m[:, None] * ff
        if not pre_only:
            ctx = ctx + c_g1[:, None] * o_ctx
            nc2 = ln(ctx) * (1 + c_sc_m[:, None]) + c_sh_m[:, None]
            cff = lin(
                F.gelu(lin(nc2, f"{b}.ff_context.net.0.proj"), approximate="tanh"),
                f"{b}.ff_context.net.2",
            )
            ctx = ctx + c_g_m[:, None] * cff

    fmod = lin(F.silu(temb), "norm_out.linear")
    fsc, fsh = fmod.chunk(2, dim=1)
    x = ln(x) * (1 + fsc[:, None]) + fsh[:, None]
    x = lin(x, "proj_out")

    x = x.reshape(bsz, gh, gw, p, p, cfg.out_channels)
    x = torch.einsum("nhwpqc->nchpwq", x)
    return x.reshape(bsz, cfg.out_channels, gh * p, gw * p)


class TestFullMMDiTOracle:
    def test_converted_checkpoint_matches_torch_oracle(self):
        cfg = MMDiTConfig.toy(num_layers=3)
        sd = _synth_state_dict(cfg)
        params = convert_mmdit(sd, num_layers=cfg.num_layers)

        rng = np.random.default_rng(1)
        b = 2
        lat = rng.normal(size=(b, cfg.in_channels, cfg.sample_size, cfg.sample_size)).astype(np.float32)
        t = np.array([917.0, 333.0], np.float32)
        ctx = rng.normal(size=(b, 6, cfg.joint_attention_dim)).astype(np.float32)
        pooled = rng.normal(size=(b, cfg.pooled_projection_dim)).astype(np.float32)

        model = MMDiT(cfg)
        # converter supplies params; constants (pos table) come from init
        consts = model.init(
            jax.random.PRNGKey(0), jnp.array(lat), jnp.array(t), jnp.array(ctx), jnp.array(pooled)
        ).get("constants", {})
        variables = dict(params)
        if consts:
            variables["constants"] = consts
        vel, temb, h1, h2 = model.apply(variables, jnp.array(lat), jnp.array(t), jnp.array(ctx), jnp.array(pooled))

        ref = _torch_mmdit_forward(sd, cfg, lat, t, ctx, pooled)
        np.testing.assert_allclose(
            np.asarray(vel), ref.numpy(), rtol=2e-3, atol=2e-3
        )


def _synth_sd35_extras(sd, cfg: MMDiTConfig, seed=7):
    """Add qk-norm scales and dual-attention weights (SD3.5 layout)."""
    rng = np.random.default_rng(seed)
    d = cfg.inner_dim
    hd = cfg.attention_head_dim

    def lin(name, i, o):
        sd[f"{name}.weight"] = (rng.normal(size=(o, i)) * 0.05).astype(np.float32)
        sd[f"{name}.bias"] = (rng.normal(size=(o,)) * 0.05).astype(np.float32)

    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{b}.attn.{nm}.weight"] = rng.uniform(0.8, 1.2, hd).astype(np.float32)
        if i in cfg.dual_attention_layers:
            # norm1 grows to 9 chunks
            lin(f"{b}.norm1.linear", d, 9 * d)
            for nm in ("to_q", "to_k", "to_v"):
                lin(f"{b}.attn2.{nm}", d, d)
            sd[f"{b}.attn2.norm_q.weight"] = rng.uniform(0.8, 1.2, hd).astype(np.float32)
            sd[f"{b}.attn2.norm_k.weight"] = rng.uniform(0.8, 1.2, hd).astype(np.float32)
            lin(f"{b}.attn2.to_out.0", d, d)
    return sd


def _torch_mmdit_forward_sd35(sd, cfg, latents, timestep, ctx_in, pooled):
    """SD3.5 oracle: qk rmsnorm per head + dual attention on listed layers."""
    d = cfg.inner_dim
    h = cfg.num_attention_heads
    hd = cfg.attention_head_dim
    p = cfg.patch_size
    T = lambda k: torch.tensor(sd[k])

    def lin(x, name):
        return x @ T(f"{name}.weight").t() + T(f"{name}.bias")

    def ln(x):
        return F.layer_norm(x, (x.shape[-1],), eps=1e-6)

    def rms(x, name):
        v = x.float()
        out = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-6)
        return out * T(name)

    lat = torch.tensor(latents)
    bsz, c, hh, ww = lat.shape
    x = F.conv2d(lat, T("pos_embed.proj.weight"), T("pos_embed.proj.bias"), stride=p)
    x = x.flatten(2).transpose(1, 2)
    gh, gw = hh // p, ww // p
    m = cfg.pos_embed_max_size
    base = cfg.sample_size // p
    grid = np.arange(m, dtype=np.float64) / (m / base)
    gw_, gh_ = np.meshgrid(grid, grid)

    def emb1d(dim, pos):
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], 1)

    table = np.concatenate([emb1d(d // 2, gw_), emb1d(d // 2, gh_)], 1).astype(np.float32)
    table = table.reshape(m, m, d)
    top, left = (m - gh) // 2, (m - gw) // 2
    x = x + torch.tensor(table[top : top + gh, left : left + gw].reshape(1, gh * gw, d))

    t = torch.tensor(timestep)
    half = 128
    expo = torch.exp(-math.log(10000) * torch.arange(half) / half)
    ang = t[:, None].float() * expo[None]
    t_feat = torch.cat([torch.sin(ang), torch.cos(ang)], -1)
    t_feat = torch.cat([t_feat[:, half:], t_feat[:, :half]], -1)
    temb = lin(F.silu(lin(t_feat, "time_text_embed.timestep_embedder.linear_1")),
               "time_text_embed.timestep_embedder.linear_2")
    temb = temb + lin(
        F.silu(lin(torch.tensor(pooled), "time_text_embed.text_embedder.linear_1")),
        "time_text_embed.text_embedder.linear_2",
    )
    ctx = lin(torch.tensor(ctx_in), "context_embedder")

    def heads(t_):
        b_, n_, _ = t_.shape
        return t_.view(b_, n_, h, hd).transpose(1, 2)

    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        pre_only = i == cfg.num_layers - 1
        dual = i in cfg.dual_attention_layers
        mod = lin(F.silu(temb), f"{b}.norm1.linear")
        if dual:
            sh, sc, g1, sh_m, sc_m, g_m, sh2, sc2, g2 = mod.chunk(9, dim=1)
        else:
            sh, sc, g1, sh_m, sc_m, g_m = mod.chunk(6, dim=1)
        normed = ln(x)
        nx = normed * (1 + sc[:, None]) + sh[:, None]
        if dual:
            nx2 = normed * (1 + sc2[:, None]) + sh2[:, None]

        if pre_only:
            cmod = lin(F.silu(temb), f"{b}.norm1_context.linear")
            csc, csh = cmod.chunk(2, dim=1)
            nc = ln(ctx) * (1 + csc[:, None]) + csh[:, None]
        else:
            cmod = lin(F.silu(temb), f"{b}.norm1_context.linear")
            c_sh, c_sc, c_g1, c_sh_m, c_sc_m, c_g_m = cmod.chunk(6, dim=1)
            nc = ln(ctx) * (1 + c_sc[:, None]) + c_sh[:, None]

        q = rms(heads(lin(nx, f"{b}.attn.to_q")), f"{b}.attn.norm_q.weight")
        k = rms(heads(lin(nx, f"{b}.attn.to_k")), f"{b}.attn.norm_k.weight")
        v = heads(lin(nx, f"{b}.attn.to_v"))
        qc = rms(heads(lin(nc, f"{b}.attn.add_q_proj")), f"{b}.attn.norm_added_q.weight")
        kc = rms(heads(lin(nc, f"{b}.attn.add_k_proj")), f"{b}.attn.norm_added_k.weight")
        vc = heads(lin(nc, f"{b}.attn.add_v_proj"))
        qj = torch.cat([q, qc], 2)
        kj = torch.cat([k, kc], 2)
        vj = torch.cat([v, vc], 2)
        o = F.scaled_dot_product_attention(qj, kj, vj)
        o = o.transpose(1, 2).reshape(qj.shape[0], -1, d)
        n_img = nx.shape[1]
        o_img = lin(o[:, :n_img], f"{b}.attn.to_out.0")
        x = x + g1[:, None] * o_img
        if dual:
            q2 = rms(heads(lin(nx2, f"{b}.attn2.to_q")), f"{b}.attn2.norm_q.weight")
            k2 = rms(heads(lin(nx2, f"{b}.attn2.to_k")), f"{b}.attn2.norm_k.weight")
            v2 = heads(lin(nx2, f"{b}.attn2.to_v"))
            o2 = F.scaled_dot_product_attention(q2, k2, v2)
            o2 = o2.transpose(1, 2).reshape(q2.shape[0], -1, d)
            x = x + g2[:, None] * lin(o2, f"{b}.attn2.to_out.0")
        nx_m = ln(x) * (1 + sc_m[:, None]) + sh_m[:, None]
        x = x + g_m[:, None] * lin(
            F.gelu(lin(nx_m, f"{b}.ff.net.0.proj"), approximate="tanh"), f"{b}.ff.net.2"
        )
        if not pre_only:
            o_ctx = lin(o[:, n_img:], f"{b}.attn.to_add_out")
            ctx = ctx + c_g1[:, None] * o_ctx
            nc_m = ln(ctx) * (1 + c_sc_m[:, None]) + c_sh_m[:, None]
            ctx = ctx + c_g_m[:, None] * lin(
                F.gelu(lin(nc_m, f"{b}.ff_context.net.0.proj"), approximate="tanh"),
                f"{b}.ff_context.net.2",
            )

    fmod = lin(F.silu(temb), "norm_out.linear")
    fsc, fsh = fmod.chunk(2, dim=1)
    x = ln(x) * (1 + fsc[:, None]) + fsh[:, None]
    x = lin(x, "proj_out")
    x = x.reshape(bsz, gh, gw, p, p, cfg.out_channels)
    x = torch.einsum("nhwpqc->nchpwq", x)
    return x.reshape(bsz, cfg.out_channels, gh * p, gw * p)


class TestSD35Oracle:
    def test_dual_attention_qk_norm_checkpoint_matches(self):
        cfg = MMDiTConfig.toy(
            num_layers=3, dual_attention_layers=(0,), qk_norm="rms_norm"
        )
        sd = _synth_state_dict(cfg)
        sd = _synth_sd35_extras(sd, cfg)
        params = convert_mmdit(
            sd, num_layers=cfg.num_layers,
            dual_attention_layers=cfg.dual_attention_layers, qk_norm="rms_norm",
        )
        rng = np.random.default_rng(2)
        b = 2
        lat = rng.normal(size=(b, cfg.in_channels, cfg.sample_size, cfg.sample_size)).astype(np.float32)
        t = np.array([700.0, 100.0], np.float32)
        ctx = rng.normal(size=(b, 6, cfg.joint_attention_dim)).astype(np.float32)
        pooled = rng.normal(size=(b, cfg.pooled_projection_dim)).astype(np.float32)

        model = MMDiT(cfg)
        consts = model.init(
            jax.random.PRNGKey(0), jnp.array(lat), jnp.array(t), jnp.array(ctx), jnp.array(pooled)
        ).get("constants", {})
        variables = dict(params)
        if consts:
            variables["constants"] = consts
        vel, *_ = model.apply(variables, jnp.array(lat), jnp.array(t), jnp.array(ctx), jnp.array(pooled))
        ref = _torch_mmdit_forward_sd35(sd, cfg, lat, t, ctx, pooled)
        np.testing.assert_allclose(np.asarray(vel), ref.numpy(), rtol=2e-3, atol=2e-3)
