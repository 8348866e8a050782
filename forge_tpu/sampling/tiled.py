"""MultiDiffusion tiled denoising for arbitrarily large canvases.

Behavioral twin of the reference's sd_forge_multidiffusion extension
(lib_multidiffusion/tiled_diffusion.py:117-649): the latent is split into
overlapping tiles, the denoiser runs per tile (batched), and tile outputs are
blended back with Gaussian weights. Here it is a pure wrapper around the
σ-space apply function — tile geometry is static, so the whole thing compiles
into the sampler's scan.
"""

from __future__ import annotations

import math
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def split_bboxes(size: int, tile: int, overlap: int) -> List[int]:
    """1-D tile start offsets covering [0, size) (reference split_bboxes
    tiled_diffusion.py:92-110)."""
    if size <= tile:
        return [0]
    stride = tile - overlap
    n = math.ceil((size - overlap) / stride)
    starts = [min(i * stride, size - tile) for i in range(n)]
    return sorted(set(starts))


def _gaussian_weights(tile_h: int, tile_w: int) -> np.ndarray:
    """Per-pixel Gaussian blend weights (Mixture-of-Diffusers)."""
    def axis(n):
        mid = (n - 1) / 2
        var = (n / 3.0) ** 2 / 4
        return np.exp(-((np.arange(n) - mid) ** 2) / (2 * var))

    return np.outer(axis(tile_h), axis(tile_w)).astype(np.float32)[..., None]


def make_tiled_apply(
    apply_model: Callable,
    latent_h: int,
    latent_w: int,
    tile: int = 96,
    overlap: int = 32,
) -> Callable:
    """Wrap apply_model(x, σ, cond) → denoised with MultiDiffusion tiling."""
    ys = split_bboxes(latent_h, min(tile, latent_h), overlap)
    xs = split_bboxes(latent_w, min(tile, latent_w), overlap)
    th, tw = min(tile, latent_h), min(tile, latent_w)
    weights = jnp.asarray(_gaussian_weights(th, tw))

    def tiled(x, sigma, cond):
        acc = jnp.zeros_like(x, dtype=jnp.float32)
        wacc = jnp.zeros(x.shape[:1] + (latent_h, latent_w, 1), jnp.float32)
        for y0 in ys:
            for x0 in xs:
                piece = jax.lax.dynamic_slice(
                    x, (0, y0, x0, 0), (x.shape[0], th, tw, x.shape[3])
                )
                out = apply_model(piece, sigma, cond).astype(jnp.float32) * weights
                acc = jax.lax.dynamic_update_slice(
                    acc,
                    jax.lax.dynamic_slice(acc, (0, y0, x0, 0), out.shape) + out,
                    (0, y0, x0, 0),
                )
                wacc = jax.lax.dynamic_update_slice(
                    wacc,
                    jax.lax.dynamic_slice(wacc, (0, y0, x0, 0), (x.shape[0], th, tw, 1))
                    + weights[None],
                    (0, y0, x0, 0),
                )
        return (acc / jnp.maximum(wacc, 1e-8)).astype(x.dtype)

    return tiled
