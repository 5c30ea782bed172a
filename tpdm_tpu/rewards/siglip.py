"""SigLIP vision tower + Aesthetic Predictor v2.5 head.

Parity targets: transformers `SiglipVisionModel` (so400m-patch14-384) and
the reference's `AestheticPredictorV2_5Model`
(reference: src/reward_models/aesthetic_predictor_v2_5/siglip_v2_5.py:23-118)
— a linear scoring head over the l2-normalized attention-pooled embedding.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def so400m(cls, **kw) -> "SiglipVisionConfig":
        return cls(**kw)

    @classmethod
    def toy(cls, **kw) -> "SiglipVisionConfig":
        d = dict(
            hidden_size=24,
            intermediate_size=48,
            num_hidden_layers=2,
            num_attention_heads=3,
            image_size=28,
            patch_size=14,
        )
        d.update(kw)
        return cls(**d)


class _SiglipLayer(nn.Module):
    config: SiglipVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_attention_heads
        hd = d // h
        b, n, _ = x.shape
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name=name
        )

        y = ln("layer_norm1")(x)
        q = nn.Dense(d, dtype=cfg.dtype, name="q_proj")(y)
        k = nn.Dense(d, dtype=cfg.dtype, name="k_proj")(y)
        v = nn.Dense(d, dtype=cfg.dtype, name="v_proj")(y)
        heads = lambda t: t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * hd**-0.5, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, dtype=cfg.dtype, name="out_proj")(o)

        y = ln("layer_norm2")(x)
        y = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=True)  # gelu_pytorch_tanh
        y = nn.Dense(d, dtype=cfg.dtype, name="fc2")(y)
        return x + y


class SiglipVisionModel(nn.Module):
    """Returns (last_hidden, pooled) — pooled via the MAP probe head."""

    config: SiglipVisionConfig

    @nn.compact
    def __call__(self, pixels: jax.Array):
        """pixels: (b, 3, H, W), siglip-normalized ((x/255-0.5)/0.5)."""
        cfg = self.config
        b = pixels.shape[0]
        p = cfg.patch_size
        x = pixels.transpose(0, 2, 3, 1)
        x = nn.Conv(
            cfg.hidden_size, (p, p), strides=p, padding="VALID",
            dtype=cfg.dtype, name="patch_embedding",
        )(x)
        x = x.reshape(b, -1, cfg.hidden_size)
        n = x.shape[1]
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (n, cfg.hidden_size)
        )
        x = x + pos[None].astype(x.dtype)

        for i in range(cfg.num_hidden_layers):
            x = _SiglipLayer(cfg, name=f"layers_{i}")(x)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="post_layernorm"
        )(x)

        # MAP head: probe-token multihead attention pooling
        d = cfg.hidden_size
        h = cfg.num_attention_heads
        hd = d // h
        probe = self.param("probe", nn.initializers.normal(0.02), (1, 1, d))
        probe_b = jnp.tile(probe.astype(x.dtype), (b, 1, 1))
        q = nn.Dense(d, dtype=cfg.dtype, name="map_q")(probe_b)
        k = nn.Dense(d, dtype=cfg.dtype, name="map_k")(x)
        v = nn.Dense(d, dtype=cfg.dtype, name="map_v")(x)
        q = q.reshape(b, 1, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        pmap = jax.nn.softmax(s * hd**-0.5, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", pmap, v).transpose(0, 2, 1, 3).reshape(b, 1, d)
        o = nn.Dense(d, dtype=cfg.dtype, name="map_out")(o)

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="map_ln")(o)
        y = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="map_fc1")(y)
        y = nn.gelu(y, approximate=True)
        y = nn.Dense(d, dtype=cfg.dtype, name="map_fc2")(y)
        pooled = (o + y)[:, 0]
        return x, pooled


from tpdm_tpu.rewards.scorers import AestheticMLP as AestheticV25Head  # noqa: E402
# same 1024/128/64/16/1 stack as the CLIP aesthetic head
# (reference siglip_v2_5.py:23-39 uses the identical scoring head)


@dataclasses.dataclass
class AestheticV25Model:
    """score = head(l2norm(siglip_pooled)); prompt-free."""

    vision: SiglipVisionModel
    vision_params: dict
    head: AestheticV25Head
    head_params: dict
    image_size: int = 384

    @classmethod
    def create(cls, vision_cfg=None, seed=0):
        vision_cfg = vision_cfg or SiglipVisionConfig.so400m()
        vision = SiglipVisionModel(vision_cfg)
        head = AestheticV25Head()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        vp = vision.init(
            k1, jnp.zeros((1, 3, vision_cfg.image_size, vision_cfg.image_size))
        )
        hp = head.init(k2, jnp.zeros((1, vision_cfg.hidden_size)))
        m = cls(vision, vp, head, hp, image_size=vision_cfg.image_size)
        m._jit = jax.jit(m._raw)
        return m

    def _raw(self, vp, hp, pixels):
        _, pooled = self.vision.apply(vp, pixels)
        pooled = pooled / jnp.clip(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
        return self.head.apply(hp, pooled)[:, 0]

    def score(self, prompt_ids, images: np.ndarray) -> np.ndarray:
        del prompt_ids
        from PIL import Image

        # SigLIP preprocessing: resize (warp) to image_size, (x-0.5)/0.5
        out = []
        for img in images:
            pil = Image.fromarray(img).resize(
                (self.image_size, self.image_size), Image.BICUBIC
            )
            out.append(np.asarray(pil))
        x = np.stack(out).astype(np.float32) / 255.0
        x = ((x - 0.5) / 0.5).transpose(0, 3, 1, 2)
        return np.asarray(self._jit(self.vision_params, self.head_params, jnp.asarray(x)))
