"""Soft inpainting: continuous-opacity mask blending during sampling.

Behavioral twin of extensions-builtin/soft-inpainting/scripts/soft_inpainting.py:
instead of the hard per-step latent composite (mask 0/1), the original and
denoised latents are blended with a σ-dependent transparency
    t = mask ** (σ^power · scale)                  (:111 get_modified_nmask)
and the blend preserves detail by interpolating vector magnitudes raised to
``detail_preservation`` separately from directions (:53 latent_blend).

All math is jnp and rides inside the compiled sampling loop — σ is a traced
scalar, so no recompile per step (the reference's on_mask_blend hook runs
eagerly per call; here the hook IS the composite inside the scan body).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SoftInpaintingSettings:
    """reference soft_inpainting.py:12-37 (infotext keys :27-36)."""

    mask_blend_power: float = 1.0
    mask_blend_scale: float = 0.5
    inpaint_detail_preservation: float = 4.0
    composite_mask_influence: float = 0.0
    composite_difference_threshold: float = 0.5
    composite_difference_contrast: float = 2.0

    def add_generation_params(self, dest: Dict[str, Any]) -> None:
        dest["Soft inpainting"] = "True"
        dest["Soft inpainting schedule bias"] = self.mask_blend_power
        dest["Soft inpainting preservation strength"] = self.mask_blend_scale
        dest["Soft inpainting transition contrast boost"] = self.inpaint_detail_preservation


def get_modified_nmask(settings: SoftInpaintingSettings, nmask: jax.Array,
                       sigma) -> jax.Array:
    """σ-scheduled transparency (reference :111-127): early (high σ) the
    denoiser dominates inside the mask; late steps converge to the original
    outside it."""
    return jnp.power(nmask, (sigma ** settings.mask_blend_power)
                     * settings.mask_blend_scale)


def latent_blend(settings: SoftInpaintingSettings, a: jax.Array, b: jax.Array,
                 t: jax.Array) -> jax.Array:
    """Magnitude-preserving interpolation (reference :53-108): lerp the
    vectors, then rescale so the channel-norm follows a power-mean of the two
    inputs' norms — keeps detail contrast through the blend. NHWC layout
    (channel norm over the last axis; reference norms over dim=1 of NCHW)."""
    t2 = t if t.ndim == b.ndim else t[..., None]
    # one scalar opacity per pixel for the magnitude schedule
    t3 = t2[..., :1]

    image_interp = a * (1.0 - t2) + b * t2

    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    current_mag = jnp.linalg.norm(image_interp.astype(f64), axis=-1,
                                  keepdims=True) + 1e-5
    dp = settings.inpaint_detail_preservation
    a_mag = jnp.linalg.norm(a.astype(f64), axis=-1, keepdims=True) ** dp
    b_mag = jnp.linalg.norm(b.astype(f64), axis=-1, keepdims=True) ** dp
    desired_mag = (a_mag * (1.0 - t3) + b_mag * t3) ** (1.0 / dp)

    return (image_interp * (desired_mag / current_mag).astype(image_interp.dtype))


def make_soft_masked_model_fn(model_fn, nmask: jax.Array, init_latent: jax.Array,
                              settings: SoftInpaintingSettings):
    """Soft variant of cfg.make_masked_model_fn: per-step σ-scheduled blend
    instead of the hard composite. nmask convention matches the pipeline's
    inpaint mask: 1 = repaint, 0 = keep original."""

    def wrapped(x, sigma):
        x0 = model_fn(x, sigma)
        pair = isinstance(x0, tuple)
        if pair:
            x0, un = x0
        t = get_modified_nmask(settings, nmask, sigma)
        blended = latent_blend(settings, init_latent.astype(jnp.float32),
                               x0.astype(jnp.float32), t).astype(x0.dtype)
        return (blended, un) if pair else blended

    return wrapped


def attach(p, args: Dict[str, Any]) -> None:
    """alwayson_scripts wiring: {"Soft inpainting": true, "Schedule bias": 1,
    "Preservation strength": 0.5, "Transition contrast boost": 4} (reference
    el() UI arg names, soft_inpainting.py:543-704) or snake_case keys."""
    def pick(*names, default):
        for n in names:
            if n in args:
                return float(args[n])
        return default

    settings = SoftInpaintingSettings(
        mask_blend_power=pick("mask_blend_power", "Schedule bias", default=1.0),
        mask_blend_scale=pick("mask_blend_scale", "Preservation strength", default=0.5),
        inpaint_detail_preservation=pick("inpaint_detail_preservation",
                                         "Transition contrast boost", default=4.0),
        composite_mask_influence=pick("composite_mask_influence",
                                      "Mask influence", default=0.0),
        composite_difference_threshold=pick("composite_difference_threshold",
                                            "Difference threshold", default=0.5),
        composite_difference_contrast=pick("composite_difference_contrast",
                                           "Difference contrast", default=2.0),
    )
    p.soft_inpainting = settings
    settings.add_generation_params(p.extra_generation_params)
