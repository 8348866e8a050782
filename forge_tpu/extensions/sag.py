"""Self-Attention Guidance (arXiv:2210.00939).

Behavioral twin of sd_forge_sag (forge_sag.py:136-166): the middle block's
self-attention map is captured, a mask of high-attention tokens selects
regions to blur adversarially, one extra denoiser pass runs on the degraded
latent, and the result is pushed away from it:
    x0 ← x0 + sag_scale · (x0_cond − x0_degraded)

The capture is trace-local: the attn1-replace hook stores the (q, k) tracers
in a closure dict, and the post-CFG hook (same jit trace) consumes them —
functional compile-time composition, no module state.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attention, xla_attention
from ..sampling.cfg import make_apply_model


def gaussian_blur_2d(x: jax.Array, kernel_size: int = 9, sigma: float = 1.0) -> jax.Array:
    """Depthwise gaussian blur, NHWC."""
    half = kernel_size // 2
    coords = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    c = x.shape[-1]
    kh = jnp.tile(g.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(g.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    pad = [(0, 0), (half, half), (0, 0), (0, 0)]
    y = jax.lax.conv_general_dilated(
        jnp.pad(x, pad, mode="edge"), kh.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    pad = [(0, 0), (0, 0), (half, half), (0, 0)]
    return jax.lax.conv_general_dilated(
        jnp.pad(y, pad, mode="edge"), kw.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def build_sag(engine, cond: Mapping[str, Any], sag_scale: float = 0.75,
              blur_sigma: float = 2.0) -> Tuple[Dict[str, Any], Callable]:
    """→ (unet_hooks, post_cfg_hook). Attach the hooks to the generation's
    manifest and CFG pipeline; requires cfg_scale > 1 (uncond present)."""
    storage: Dict[str, Any] = {}

    def attn1_record(q, k, v, extra):
        storage["qk"] = (q, k, extra["n_heads"])
        return attention(q, k, v, heads=extra["n_heads"])

    hooks = {"attn1_replace": {("middle", 0): attn1_record}}

    apply_raw = engine.unet_apply_fn()
    apply_degraded = make_apply_model(
        apply_raw, engine.loaded.unet, engine.predictor, engine.compute_dtype
    )

    def post_cfg(x0, eps_cond, eps_uncond, x, sigma):
        if "qk" not in storage:
            return x0
        q, k, heads = storage["qk"]
        # cond half of the CFG batch, attention probabilities
        b2, l, inner = q.shape
        bb = x.shape[0]
        d = inner // heads
        qh = q[:bb].reshape(bb, l, heads, d).transpose(0, 2, 1, 3).astype(jnp.float32)
        kh = k[:bb].reshape(bb, l, heads, d).transpose(0, 2, 1, 3).astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(d)
        probs = jax.nn.softmax(s, axis=-1)
        # token importance: column-mean attention over heads+queries
        importance = probs.mean(axis=(1, 2))  # [B, L]
        mask_tokens = (importance > importance.mean(axis=1, keepdims=True)).astype(jnp.float32)
        side = int(math.sqrt(l))
        mask = mask_tokens.reshape(bb, side, side, 1)
        mask = jax.image.resize(mask, (bb, x.shape[1], x.shape[2], 1), "nearest")

        degraded_in = gaussian_blur_2d(x0, sigma=blur_sigma) * mask + x0 * (1 - mask)
        # re-noise to the current σ and denoise once more with cond only
        noisy = degraded_in + (x - x0)
        degraded = apply_degraded(noisy, sigma, cond)
        return x0 + sag_scale * (eps_cond - degraded)

    return hooks, post_cfg
