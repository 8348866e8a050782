"""CLIP ViT image encoder (for IP-Adapter / Revision).

Behavioral twin of the reference's clipvision loader+encoder
(backend/patcher/clipvision.py:190): HF CLIPVisionModel layout
(vision_model.embeddings.*, encoder.layers.N.*, post_layernorm,
visual_projection). Returns both the projected image embed and the
penultimate hidden states (IP-Adapter-plus consumes the latter).
"""

from __future__ import annotations

from typing import Any, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from ..ops.attention import attention

# OpenAI CLIP normalization (public constants)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(image: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8/float [H,W,3] → normalized [1,size,size,3]."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    img = Image.fromarray(arr).resize((size, size), Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    return ((x - CLIP_MEAN) / CLIP_STD)[None]


def clip_vision_apply(
    params: Mapping[str, Any],
    pixels: jax.Array,  # [B, H, W, 3] normalized
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """→ (projected_embed [B,P], pooled [B,D], penultimate_hidden [B,L,D])."""
    vm = params["vision_model"]
    emb = vm["embeddings"]
    pw = emb["patch_embedding"]["weight"]  # HWIO after load transform
    patch = pw.shape[0]
    x = jax.lax.conv_general_dilated(
        pixels.astype(pw.dtype), pw, (patch, patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=nn._PRECISION,
    )
    b, gh, gw, width = x.shape
    x = x.reshape(b, gh * gw, width)
    cls = jnp.broadcast_to(emb["class_embedding"].reshape(1, 1, width), (b, 1, width))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + emb["position_embedding"]["weight"][: x.shape[1]].astype(x.dtype)

    if "pre_layrnorm" in vm:  # HF's historical typo is part of the key space
        x = nn.layer_norm(x, vm["pre_layrnorm"])

    heads = width // 64
    layers = vm["encoder"]["layers"]
    penultimate = None
    for i in range(len(layers)):
        lp = layers[str(i)]
        if i == len(layers) - 1:
            penultimate = x
        h = nn.layer_norm(x, lp["layer_norm1"])
        q = nn.linear(h, lp["self_attn"]["q_proj"])
        k = nn.linear(h, lp["self_attn"]["k_proj"])
        v = nn.linear(h, lp["self_attn"]["v_proj"])
        x = x + nn.linear(attention(q, k, v, heads=heads, impl="xla"), lp["self_attn"]["out_proj"])
        h = nn.layer_norm(x, lp["layer_norm2"])
        h = nn.linear(h, lp["mlp"]["fc1"])
        h = nn.quick_gelu(h)
        x = x + nn.linear(h, lp["mlp"]["fc2"])

    pooled = nn.layer_norm(x[:, 0:1], vm["post_layernorm"])[:, 0]
    projected = pooled
    if "visual_projection" in params:
        projected = jnp.einsum(
            "bd,od->bo", pooled, params["visual_projection"]["weight"].astype(pooled.dtype),
            precision=nn._PRECISION,
        )
    return projected, pooled, penultimate
