"""Perturbed-Attention Guidance (arXiv:2403.17377).

Behavioral twin of sd_forge_perturbed_attention (forge_perturbed_attention.py:
60-86): after CFG, run one extra denoiser pass whose self-attention is
replaced by identity (v passthrough) and push the result away from it:
    x0 ← x0 + pag_scale · (x0_cond − x0_perturbed)
Implemented as a post-CFG hook closing over a second compiled apply function
built from an identity-attn1 hook manifest.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax.numpy as jnp

from ..sampling.cfg import make_apply_model


def identity_attn1_hooks() -> Mapping[str, Any]:
    def attn1_identity(q, k, v, extra):
        return v  # attention map = identity

    return {"attn1_replace_all": attn1_identity}


def build_pag_post_cfg(engine, cond: Mapping[str, Any], pag_scale: float = 3.0) -> Callable:
    """→ post_cfg hook for make_cfg_model_fn. The perturbed pass reuses the
    engine's params (closure) with the identity-attn1 manifest."""
    apply_raw = engine.unet_apply_fn(hooks=identity_attn1_hooks())
    apply_perturbed = make_apply_model(
        apply_raw, engine.loaded.unet, engine.predictor, engine.compute_dtype
    )

    def post_cfg(x0, eps_cond, eps_uncond, x, sigma):
        perturbed = apply_perturbed(x, sigma, cond)
        return x0 + pag_scale * (eps_cond - perturbed)

    return post_cfg
