"""FreeU (arXiv:2309.11497): backbone/skip rebalancing for free quality.

Behavioral twin of sd_forge_freeu (forge_freeu.py:61 output_block_patch):
on the two highest-channel decoder stages, scale backbone features by b1/b2
and low-frequency-filter the skip connection by s1/s2. Pure hook-manifest
entry; NHWC layout (channels last)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Scale the low-frequency box of the 2-D spectrum (NHWC)."""
    dtype = x.dtype
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    b, h, w, c = x.shape
    ch, cw = h // 2, w // 2
    mask = jnp.ones((1, h, w, 1), jnp.float32)
    mask = mask.at[:, ch - threshold : ch + threshold, cw - threshold : cw + threshold, :].set(scale)
    xf = xf * mask
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    out = jnp.fft.ifftn(xf, axes=(1, 2)).real
    return out.astype(dtype)


def build_freeu_hooks(
    model_channels: int = 320,
    b1: float = 1.01,
    b2: float = 1.02,
    s1: float = 0.99,
    s2: float = 0.95,
) -> Dict[str, object]:
    scale_map = {model_channels * 4: (b1, s1), model_channels * 2: (b2, s2)}

    def output_block_patch(h, skip, block_id):
        c = h.shape[-1]
        if c in scale_map:
            b, s = scale_map[c]
            half = c // 2
            # scale the backbone half of the channels (reference Fooocus-style
            # mean-normalized variant keeps means stable)
            hmean = h.mean(axis=-1, keepdims=True)
            h = h.at[..., :half].multiply(b)
            h = h - (h.mean(axis=-1, keepdims=True) - hmean)
            skip = fourier_filter(skip, threshold=1, scale=s)
        return h, skip

    return {"output_block_patch": (output_block_patch,)}
