"""AutoencoderKL (the SD VAE) as pure functions over `first_stage_model.*` keys.

Behavioral twin of the reference's IntegratedAutoencoderKL
(backend/nn/vae.py:140-316): encoder/decoder resnet stacks with mid-block
single-head spatial attention, the encoder's asymmetric-pad strided
downsample, and the diagonal-Gaussian posterior. Activations NHWC; latent
scale/shift ("process_in/out" regulation) lives in sampling/latent_formats.py.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.attention import attention_single_head_spatial


def _resnet(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    from ..ops.fused_gn_conv import gn_silu_conv3x3

    h = gn_silu_conv3x3(x, p["norm1"], p["conv1"], eps=1e-6)
    h = gn_silu_conv3x3(h, p["norm2"], p["conv2"], eps=1e-6)
    if "nin_shortcut" in p:
        x = nn.conv2d(x, p["nin_shortcut"])
    return x + h


def _attn(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    b, hh, ww, c = x.shape
    h = nn.group_norm(x, p["norm"], eps=1e-6)
    # q/k/v/proj_out are 1x1 convs in the checkpoint; as HWIO [1,1,C,C] they
    # are plain channel matmuls.
    def proj(name, inp):
        w = p[name]["weight"]
        wm = w.reshape(w.shape[-2], w.shape[-1]) if w.ndim == 4 else w.T
        return jnp.einsum(
            "b...c,co->b...o", inp, wm.astype(x.dtype), precision=nn._PRECISION
        ) + p[name]["bias"].astype(x.dtype)

    hf = h.reshape(b, hh * ww, c)
    out = attention_single_head_spatial(proj("q", hf), proj("k", hf), proj("v", hf))
    return x + proj("proj_out", out.reshape(b, hh, ww, c))


def encoder_apply(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,3] → moments [B,H/8,W/8,2*z]."""
    h = nn.conv2d(x, p["conv_in"], padding=1)
    down = p["down"]
    for i in range(len(down)):
        level = down[str(i)]
        blocks = level["block"]
        for j in range(len(blocks)):
            h = _resnet(blocks[str(j)], h)
        if "downsample" in level:
            # ldm uses asymmetric (0,1,0,1) padding before the stride-2 conv
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = nn.conv2d(h, level["downsample"]["conv"], stride=2)
    mid = p["mid"]
    h = _resnet(mid["block_1"], h)
    h = _attn(mid["attn_1"], h)
    h = _resnet(mid["block_2"], h)
    h = nn.group_norm(h, p["norm_out"], eps=1e-6, act="silu")
    return nn.conv2d(h, p["conv_out"], padding=1)


def decoder_apply(p: Mapping[str, Any], z: jax.Array) -> jax.Array:
    """z [B,h,w,zc] → image [B,8h,8w,3] in [-1, 1]."""
    h = nn.conv2d(z, p["conv_in"], padding=1)
    mid = p["mid"]
    h = _resnet(mid["block_1"], h)
    h = _attn(mid["attn_1"], h)
    h = _resnet(mid["block_2"], h)
    up = p["up"]
    for i in reversed(range(len(up))):
        level = up[str(i)]
        blocks = level["block"]
        for j in range(len(blocks)):
            h = _resnet(blocks[str(j)], h)
        if "upsample" in level:
            h = nn.upsample_nearest_2x(h)
            h = nn.conv2d(h, level["upsample"]["conv"], padding=1)
    h = nn.group_norm(h, p["norm_out"], eps=1e-6, act="silu")
    return nn.conv2d(h, p["conv_out"], padding=1)


def vae_encode(
    params: Mapping[str, Any],
    x: jax.Array,
    noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Encode image → latent sample (posterior mean if `noise` is None,
    else mean + std·noise). `x` in [-1, 1], NHWC."""
    moments = encoder_apply(params["encoder"], x)
    if "quant_conv" in params:
        moments = nn.conv2d(moments, params["quant_conv"])
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if noise is None:
        return mean
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mean + std * noise.astype(mean.dtype)


def vae_decode(params: Mapping[str, Any], z: jax.Array) -> jax.Array:
    if "post_quant_conv" in params:
        z = nn.conv2d(z, params["post_quant_conv"])
    return decoder_apply(params["decoder"], z)
