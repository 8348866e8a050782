"""Latent Mega Modifier: CFG-domain latent tweaks (sharpness, tonemap,
contrast, CFG-drift correction, extra noise).

Behavioral twin of sd_forge_latent_modifier
(lib_latent_modifier/sampler_mega_modifier.py:869-1170 mega_modify →
set_model_sampler_cfg_function): operates on the noise prediction
Δ = cond − uncond before the CFG combine, then applies post-combine
corrections. Implemented as a cfg_combine_fn in jnp; our inputs are x0-space
predictions, which is the same affine frame the reference converts into
(sampler_mega_modifier.py:920-923).

Supported here: sharpness {gaussian, cas}, tonemap {reinhard,
reinhard_perchannel, arctan, quantile, cfg-mimic, spatial-norm}, contrast,
combat drift {subtract, subtract_channels, subtract_median, sharpen},
rescale-CFG phi, extra noise {gaussian, uniform} add/speckle. The exotic
noise colors (perlin/pink/green) and dyn-cfg augmentations are not ported —
they need host RNG shapes the compiled loop can't express cheaply; requests
naming them raise so callers aren't silently served different images.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_blur(x: jax.Array, ksize: int = 9, sigma: float = 1.0) -> jax.Array:
    from .sag import gaussian_blur_2d

    return gaussian_blur_2d(x, kernel_size=ksize, sigma=sigma)


def _cas(img: jax.Array, amount) -> jax.Array:
    """Contrast-adaptive sharpening (sampler_mega_modifier.py:26-66), NHWC."""
    pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    a = pad[:, :-2, :-2]; b = pad[:, :-2, 1:-1]; c = pad[:, :-2, 2:]
    d = pad[:, 1:-1, :-2]; e = pad[:, 1:-1, 1:-1]; f = pad[:, 1:-1, 2:]
    g = pad[:, 2:, :-2]; h = pad[:, 2:, 1:-1]; i = pad[:, 2:, 2:]
    mn = jnp.minimum(jnp.minimum(jnp.minimum(b, d), jnp.minimum(e, f)), h)
    mx = jnp.maximum(jnp.maximum(jnp.maximum(b, d), jnp.maximum(e, f)), h)
    mn2 = jnp.minimum(jnp.minimum(a, c), jnp.minimum(g, i))
    mx2 = jnp.maximum(jnp.maximum(a, c), jnp.maximum(g, i))
    mx = mx + mx2
    mn = mn + mn2
    inv_mx = 1.0 / (mx + 1e-8)
    amp = jnp.clip(jnp.minimum(mn, 2.0 - mx) * inv_mx, 0, 1)
    amp = jnp.sqrt(amp)
    w = -amp * (amount * (0.125 - 0.075) + 0.075)
    div = 1.0 / (1.0 + 4.0 * w)
    out = (b * w + d * w + f * w + h * w + e) * div
    return out.astype(img.dtype)


def _center_perchannel(t):
    return t - t.mean(axis=(1, 2), keepdims=True)


def _center_0channel(t):
    # zero-center only latent channel 0 (luminance-like; birchlabs drift fix)
    mean0 = t[..., :1].mean(axis=(1, 2), keepdims=True)
    return t - jnp.concatenate([mean0, jnp.zeros_like(t[..., 1:])], axis=-1)


def _center_median(t):
    med = jnp.median(t.reshape(t.shape[0], -1), axis=1)
    return t - med[:, None, None, None]


def _channel_sharpen(t):
    return t + (t - _gaussian_blur(t))


@dataclasses.dataclass(frozen=True)
class LatentModifierSpec:
    sharpness_multiplier: float = 0.0
    sharpness_method: str = "gaussian"
    tonemap_multiplier: float = 0.0
    tonemap_method: str = "reinhard"
    tonemap_percentile: float = 100.0
    contrast_multiplier: float = 0.0
    combat_method: str = "subtract"
    combat_cfg_drift: float = 0.0
    rescale_cfg_phi: float = 0.0
    extra_noise_type: str = "gaussian"
    extra_noise_method: str = "add"
    extra_noise_multiplier: float = 0.0
    seed: int = 0

    def __post_init__(self):
        if self.extra_noise_multiplier and self.extra_noise_type not in ("gaussian", "uniform"):
            raise ValueError(f"extra noise type {self.extra_noise_type!r} not ported "
                             "(perlin/pink/green need host RNG)")

    def build(self, sigmas_np, predictor=None) -> Callable:
        return build_latent_modifier_cfg_fn(self, sigmas_np, predictor)


def build_latent_modifier_cfg_fn(spec: LatentModifierSpec,
                                 sigmas_np: Optional[np.ndarray] = None,
                                 predictor=None) -> Callable:
    key0 = jax.random.PRNGKey(spec.seed)
    table = (jnp.asarray(-np.asarray(sigmas_np[:-1], np.float32))
             if sigmas_np is not None else None)
    n_steps = (len(sigmas_np) - 1) if sigmas_np is not None else 1

    def combine(x0_cond, x0_uncond, x, sigma, cfg_scale):
        f32 = jnp.float32
        cond = x0_cond.astype(f32)
        uncond = x0_uncond.astype(f32)

        if predictor is not None:
            t = jnp.clip(predictor.timestep(sigma) / 999.0, 0.0, 1.0)
        elif table is not None:
            idx = jnp.clip(jnp.searchsorted(table, -sigma, side="right") - 1,
                           0, max(n_steps - 1, 1))
            t = 1.0 - idx.astype(f32) / max(n_steps - 1, 1)
        else:
            t = jnp.float32(0.5)
        alpha_t = 1.0 - t  # low at high noise (sampler_mega_modifier.py:963)

        if spec.extra_noise_multiplier:
            if table is not None:
                step = jnp.clip(jnp.searchsorted(table, -sigma, side="right") - 1,
                                0, max(n_steps - 1, 1))
            else:
                step = jnp.int32(0)
            key = jax.random.fold_in(key0, step)
            if spec.extra_noise_type == "gaussian":
                noise = jax.random.normal(key, cond.shape, f32)
            else:  # uniform
                noise = (jax.random.uniform(key, cond.shape, f32) - 0.5) * 2 * 1.73
            a = alpha_t * 0.001 * spec.extra_noise_multiplier
            if spec.extra_noise_method == "speckle":
                cond = cond + cond * noise * a
                uncond = uncond - uncond * noise * a
            else:  # add
                cond = cond + noise * a
                uncond = uncond - noise * a

        if spec.sharpness_multiplier:
            if spec.sharpness_method == "cas":
                degraded = _cas(cond, jnp.clip(sigma, 0.0, 1.0))
            else:  # gaussian
                degraded = _gaussian_blur(cond)
            a = alpha_t * 0.001 * spec.sharpness_multiplier
            cond = degraded * a + cond * (1.0 - a)

        pred = cond - uncond

        if spec.tonemap_multiplier:
            pred = _tonemap(spec, pred, uncond, cfg_scale)

        if spec.contrast_multiplier:
            a = alpha_t * 0.001 * spec.contrast_multiplier
            std = pred.std(axis=(1, 2, 3), keepdims=True) + 1e-8
            pred = (pred / std) * a + pred * (1.0 - a)

        x_final = uncond + pred * cfg_scale
        if spec.rescale_cfg_phi:
            ro_pos = cond.std(axis=(1, 2, 3), keepdims=True)
            ro_cfg = x_final.std(axis=(1, 2, 3), keepdims=True) + 1e-8
            x_final = (spec.rescale_cfg_phi * (x_final * ro_pos / ro_cfg)
                       + (1.0 - spec.rescale_cfg_phi) * x_final)

        if spec.combat_cfg_drift:
            fn = {"subtract": _center_perchannel,
                  "subtract_channels": _center_0channel,
                  "subtract_median": _center_median,
                  "sharpen": _channel_sharpen}[spec.combat_method]
            a = jnp.clip(alpha_t, 0.0, 1.0) * spec.combat_cfg_drift
            x_final = fn(x_final) * a + x_final * (1.0 - a)

        return x_final.astype(x0_cond.dtype)

    return combine


def _tonemap(spec: LatentModifierSpec, pred, uncond, cfg_scale):
    m, pct = spec.tonemap_multiplier, spec.tonemap_percentile
    if spec.tonemap_method == "reinhard":
        mag = jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-10
        unit = pred / mag
        mean = mag.mean(axis=(1, 2, 3), keepdims=True)
        std = mag.std(axis=(1, 2, 3), keepdims=True)
        top = (std * 3 * (100 / pct) + mean) * m
        scaled = mag / top
        new_mag = scaled / (scaled + 1.0) * top
        return unit * new_mag
    if spec.tonemap_method == "reinhard_perchannel":
        b, h, w, c = pred.shape
        flat = jnp.moveaxis(pred, -1, 1).reshape(b, c, -1)
        mag = jnp.linalg.norm(flat, axis=2, keepdims=True) + 1e-10
        unit = flat / mag
        mean = mag.mean(axis=2, keepdims=True)
        top = (3 * (100 / pct) + mean) * m
        scaled = mag / top
        out = unit * (scaled / (scaled + 1.0) * top)
        return jnp.moveaxis(out.reshape(b, c, h, w), 1, -1)
    if spec.tonemap_method == "arctan":
        mag = jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-10
        unit = pred / mag
        unit = jnp.arctan(unit * m) / m + unit * (100 - pct) / 100
        return unit * mag
    if spec.tonemap_method == "quantile":
        s = jnp.quantile(jnp.abs(uncond + pred * cfg_scale).reshape(pred.shape[0], -1),
                         pct / 100, axis=-1) * m
        s = jnp.maximum(s, 1.0)[:, None, None, None]
        return jnp.clip(pred, -s, s) / s
    if spec.tonemap_method == "cfg-mimic":
        b, h, w, c = pred.shape
        flat = jnp.moveaxis(pred, -1, 1).reshape(b, c, -1)
        mimic = flat * m
        mimic_c = mimic - mimic.mean(axis=2, keepdims=True)
        mimic_max = jnp.abs(mimic_c).max(axis=2, keepdims=True)
        lat_c = flat - flat.mean(axis=2, keepdims=True)
        lat_q = jnp.quantile(jnp.abs(lat_c), pct / 100, axis=2, keepdims=True)
        s = jnp.maximum(lat_q, mimic_max) + 1e-10
        out = jnp.clip(flat, -s, s) / s * mimic_max + mimic.mean(axis=2, keepdims=True)
        return jnp.moveaxis(out.reshape(b, c, h, w), 1, -1)
    if spec.tonemap_method == "spatial-norm":
        s = jnp.sqrt(jnp.mean(pred * pred, axis=(1, 2, 3), keepdims=True))
        value = m / 2 / cfg_scale
        s = jnp.maximum(s, value)
        return pred * (value / s)
    raise ValueError(f"unknown tonemap method {spec.tonemap_method!r}")


def attach(p, args: dict) -> None:
    known = {f.name for f in dataclasses.fields(LatentModifierSpec)}
    spec = LatentModifierSpec(**{k: v for k, v in args.items() if k in known})
    p.cfg_combine_hook = spec
    if spec.tonemap_multiplier:
        p.extra_generation_params["Tonemap multiplier"] = spec.tonemap_multiplier
        p.extra_generation_params["Tonemap method"] = spec.tonemap_method
    if spec.sharpness_multiplier:
        p.extra_generation_params["Sharpness multiplier"] = spec.sharpness_multiplier
