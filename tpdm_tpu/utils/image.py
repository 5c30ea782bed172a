"""Host/device image post- and pre-processing."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def postprocess_images(decoded: jax.Array) -> np.ndarray:
    """VAE output (b, 3, H, W) in [-1, 1] -> uint8 (b, H, W, 3).

    Parity with diffusers VaeImageProcessor.postprocess (the reference's
    image_processor, modeling_sd3_pnt.py:184,643): x/2 + 0.5, clamp, to
    bytes.
    """
    x = jnp.clip(decoded.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
    x = jnp.round(x * 255.0).astype(jnp.uint8)
    return np.asarray(x.transpose(0, 2, 3, 1))


def preprocess_images(images: np.ndarray) -> jnp.ndarray:
    """uint8 (b, H, W, 3) -> (b, 3, H, W) in [-1, 1] (VAE encode input)."""
    x = jnp.asarray(images, jnp.float32) / 255.0
    return (x * 2.0 - 1.0).transpose(0, 3, 1, 2)


def bicubic_resize_center_crop(
    images: np.ndarray, size: int
) -> np.ndarray:
    """Resize shorter side to `size` (bicubic) then center-crop to square —
    the CLIP/ImageReward preprocessing geometry
    (reference: src/reward_models/ImageReward/ImageReward.py:31-40). Uses
    PIL on host for exact torchvision-Resize parity.
    """
    from PIL import Image

    out = []
    for img in images:
        pil = Image.fromarray(img)
        w, h = pil.size
        scale = size / min(w, h)
        nw, nh = round(w * scale), round(h * scale)
        pil = pil.resize((nw, nh), Image.BICUBIC)
        left = (nw - size) // 2
        top = (nh - size) // 2
        out.append(np.asarray(pil.crop((left, top, left + size, top + size))))
    return np.stack(out)


def normalize_clip(images: np.ndarray) -> np.ndarray:
    """uint8 (b, H, W, 3) -> normalized float32 (b, 3, H, W), CLIP stats."""
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    x = images.astype(np.float32) / 255.0
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2)
