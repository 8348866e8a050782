"""Dynamic Thresholding (mcmonkeyprojects/sd-dynamic-thresholding).

Behavioral twin of sd_forge_dynamic_thresholding
(lib_dynamic_thresholding/dynthres_core.py DynThresh.dynthresh +
dynthres.py:48 set_model_sampler_cfg_function): run the CFG combine at the
user's cfg_scale, but rescale/clamp the result's per-channel variability to
what a lower "mimic" scale would have produced — high CFG without the burn.

Expressed as a ``cfg_combine_fn`` (the reference's sampler_cfg_function slot)
with all math in jnp so it traces into the compiled sampling loop; the
per-step schedule modes derive the step fraction from σ via the same
searchsorted trick the prompt scheduler uses (no host sync per step).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

MODES = ["Constant", "Linear Down", "Cosine Down", "Half Cosine Down",
         "Linear Up", "Cosine Up", "Half Cosine Up", "Power Up", "Power Down",
         "Linear Repeating", "Cosine Repeating", "Sawtooth"]


def _interpret_scale(scale, mode: str, minimum, frac, sched_val: float):
    """Per-step scale schedule (dynthres_core.py:29-57 interpret_scale),
    with ``frac`` a traced step fraction in [0, 1]."""
    scale = scale - minimum
    if mode == "Constant":
        pass
    elif mode == "Linear Down":
        scale = scale * (1.0 - frac)
    elif mode == "Half Cosine Down":
        scale = scale * jnp.cos(frac)
    elif mode == "Cosine Down":
        scale = scale * jnp.cos(frac * 1.5707)
    elif mode == "Linear Up":
        scale = scale * frac
    elif mode == "Half Cosine Up":
        scale = scale * (1.0 - jnp.cos(frac))
    elif mode == "Cosine Up":
        scale = scale * (1.0 - jnp.cos(frac * 1.5707))
    elif mode == "Power Up":
        scale = scale * jnp.power(frac, sched_val)
    elif mode == "Power Down":
        scale = scale * (1.0 - jnp.power(frac, sched_val))
    elif mode == "Linear Repeating":
        portion = (frac * sched_val) % 1.0
        scale = scale * jnp.where(portion < 0.5, (0.5 - portion) * 2, (portion - 0.5) * 2)
    elif mode == "Cosine Repeating":
        scale = scale * (jnp.cos(frac * 6.28318 * sched_val) * 0.5 + 0.5)
    elif mode == "Sawtooth":
        scale = scale * ((frac * sched_val) % 1.0)
    else:
        raise ValueError(f"unknown dynthresh mode {mode!r}")
    return scale + minimum


def build_dynthresh_cfg_fn(
    mimic_scale: float = 7.0,
    threshold_percentile: float = 1.0,
    mimic_mode: str = "Constant",
    mimic_scale_min: float = 0.0,
    cfg_mode: str = "Constant",
    cfg_scale_min: float = 0.0,
    sched_val: float = 1.0,
    separate_feature_channels: bool = True,
    scaling_startpoint: str = "MEAN",
    variability_measure: str = "AD",
    interpolate_phi: float = 1.0,
    sigmas_np: Optional[np.ndarray] = None,
) -> Callable:
    """→ cfg_combine_fn(eps_cond, eps_uncond, x, sigma, cfg_scale) for
    make_cfg_model_fn. Math follows dynthres_core.py:59-125 exactly; inputs
    here are x0-space predictions (our CFG operates on denoised outputs,
    equivalent under the affine σ-space mapping)."""
    table = (jnp.asarray(-np.asarray(sigmas_np[:-1], np.float32))
             if sigmas_np is not None else None)
    n_steps = (len(sigmas_np) - 1) if sigmas_np is not None else 1

    def combine(eps_cond, eps_uncond, x, sigma, cfg_scale):
        if table is not None and n_steps > 1:
            idx = jnp.clip(jnp.searchsorted(table, -sigma, side="right") - 1,
                           0, n_steps - 1)
            frac = idx.astype(jnp.float32) / max(n_steps - 1, 1)
        else:
            frac = jnp.float32(0.0)

        mim = _interpret_scale(jnp.float32(mimic_scale), mimic_mode,
                               mimic_scale_min, frac, sched_val)
        cfg = _interpret_scale(cfg_scale, cfg_mode, cfg_scale_min, frac, sched_val)

        f32 = jnp.float32
        relative = (eps_cond - eps_uncond).astype(f32)
        uncond = eps_uncond.astype(f32)
        mim_target = uncond + relative * mim
        cfg_target = uncond + relative * cfg

        b = mim_target.shape[0]
        c = mim_target.shape[-1]
        # [B, C, H*W] like the reference's flatten(2) on NCHW
        mim_flat = jnp.moveaxis(mim_target, -1, 1).reshape(b, c, -1)
        cfg_flat = jnp.moveaxis(cfg_target, -1, 1).reshape(b, c, -1)
        mim_means = mim_flat.mean(axis=2, keepdims=True)
        cfg_means = cfg_flat.mean(axis=2, keepdims=True)
        mim_centered = mim_flat - mim_means
        cfg_centered = cfg_flat - cfg_means

        if separate_feature_channels:
            if variability_measure == "STD":
                mim_ref = mim_centered.std(axis=2, keepdims=True)
                cfg_ref = cfg_centered.std(axis=2, keepdims=True)
            else:  # AD
                mim_ref = jnp.abs(mim_centered).max(axis=2, keepdims=True)
                cfg_ref = jnp.quantile(jnp.abs(cfg_centered), threshold_percentile,
                                       axis=2, keepdims=True)
        else:
            if variability_measure == "STD":
                mim_ref = mim_centered.std()
                cfg_ref = cfg_centered.std()
            else:
                mim_ref = jnp.abs(mim_centered).max()
                cfg_ref = jnp.quantile(jnp.abs(cfg_centered), threshold_percentile)

        if scaling_startpoint == "ZERO":
            result = cfg_flat * (mim_ref / jnp.maximum(cfg_ref, 1e-12))
        else:  # MEAN
            if variability_measure == "STD":
                renorm = (cfg_centered / jnp.maximum(cfg_ref, 1e-12)) * mim_ref
            else:
                max_ref = jnp.maximum(mim_ref, cfg_ref)
                clamped = jnp.clip(cfg_centered, -max_ref, max_ref)
                renorm = (clamped / jnp.maximum(max_ref, 1e-12)) * mim_ref
            result = renorm + cfg_means

        out = jnp.moveaxis(result.reshape((b, c) + mim_target.shape[1:-1]), 1, -1)
        if interpolate_phi != 1.0:
            out = out * interpolate_phi + cfg_target * (1.0 - interpolate_phi)
        return out.astype(eps_cond.dtype)

    return combine


import dataclasses


@dataclasses.dataclass(frozen=True)
class DynThreshSpec:
    """Deferred cfg_combine hook: σ schedule is only known at sample-fn build
    time, so processing calls .build(sigmas_np) then (hashable for the
    jit-cache digest because it is a plain frozen dataclass)."""

    mimic_scale: float = 7.0
    threshold_percentile: float = 1.0
    mimic_mode: str = "Constant"
    mimic_scale_min: float = 0.0
    cfg_mode: str = "Constant"
    cfg_scale_min: float = 0.0
    sched_val: float = 1.0
    separate_feature_channels: bool = True
    scaling_startpoint: str = "MEAN"
    variability_measure: str = "AD"
    interpolate_phi: float = 1.0

    def build(self, sigmas_np, predictor=None) -> Callable:
        return build_dynthresh_cfg_fn(sigmas_np=sigmas_np,
                                      **dataclasses.asdict(self))


def attach(p, args: dict) -> None:
    """alwayson_scripts wiring (reference
    scripts/forge_dynamic_thresholding.py:45 process_before_every_sampling)."""
    known = {f.name for f in dataclasses.fields(DynThreshSpec)}
    p.cfg_combine_hook = DynThreshSpec(
        **{k: v for k, v in args.items() if k in known})
    p.extra_generation_params["Dynamic thresholding enabled"] = "True"
    p.extra_generation_params["Mimic scale"] = args.get("mimic_scale", 7.0)
    p.extra_generation_params["Threshold percentile"] = args.get("threshold_percentile", 1.0)
