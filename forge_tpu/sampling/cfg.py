"""CFG executor: builds the `model_fn(x, σ) → denoised` the samplers integrate.

The TPU re-expression of the reference's sampling core
(backend/sampling/sampling_function.py:325 sampling_function +
calc_cond_uncond_batch:154 + backend/modules/k_model.py:25 KModel):

  * cond and uncond are fused into ONE model call by batch concatenation
    (always — HBM is planned ahead, no dynamic free-memory rebatching)
  * uncond is skipped entirely when cfg == 1 (reference :295)
  * the pre/post-CFG hook pipeline is compile-time function composition:
    hooks are baked into the returned closure; changing the hook set builds a
    new jitted program (the patch-manifest model, SURVEY.md §7)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp


def make_apply_model(
    net_apply: Callable,
    params: Any,
    predictor,
    compute_dtype=jnp.bfloat16,
) -> Callable:
    """KModel equivalent: σ-space wrapper around a raw network.

    net_apply(params, x, timesteps, **cond) must return the network's raw
    prediction (eps/v/velocity). Returns apply(x, sigma, cond_dict) → x0.
    """

    def apply(x, sigma, cond: Mapping[str, Any]):
        sigma_b = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (x.shape[0],))
        xi = predictor.calculate_input(sigma_b, x.astype(jnp.float32))
        t = predictor.timestep(sigma_b)
        out = net_apply(params, xi.astype(compute_dtype), t, **cond)
        return predictor.calculate_denoised(sigma_b, out.astype(jnp.float32), x.astype(jnp.float32))

    return apply


def make_cfg_model_fn(
    apply_model: Callable,
    cond: Mapping[str, Any],
    uncond: Optional[Mapping[str, Any]],
    cfg_scale: float,
    cfg_rescale: float = 0.0,
    pre_cfg_hooks: Sequence[Callable] = (),
    post_cfg_hooks: Sequence[Callable] = (),
) -> Callable:
    """Build model_fn(x, σ) for the samplers.

    cond/uncond are dicts of conditioning tensors with leading batch dim equal
    to x's batch (e.g. {"context": [B,L,D], "y": [B,adm]}). Passing uncond=None
    skips the uncond branch entirely (reference skip-uncond at cfg==1, :295);
    cfg_scale itself may be a traced value so changing it never recompiles.
    """
    skip_uncond = uncond is None

    def model_fn(x, sigma):
        if skip_uncond:
            denoised = apply_model(x, sigma, cond)
            x0 = denoised
            eps_cond, eps_uncond = denoised, denoised
        else:
            both = {}
            for key in cond:
                c, u = cond[key], uncond[key]
                both[key] = jnp.concatenate([c, u], axis=0)
            x2 = jnp.concatenate([x, x], axis=0)
            out = apply_model(x2, sigma, both)
            eps_cond, eps_uncond = jnp.split(out, 2, axis=0)

            for hook in pre_cfg_hooks:
                eps_cond, eps_uncond = hook(eps_cond, eps_uncond, x, sigma)

            x0 = eps_uncond + cfg_scale * (eps_cond - eps_uncond)

        if cfg_rescale > 0.0 and not skip_uncond:
            # RescaleCFG (arXiv:2305.08891): match per-image std of the
            # CFG-combined result to the cond branch.
            std_cond = jnp.std(eps_cond, axis=tuple(range(1, x0.ndim)), keepdims=True)
            std_cfg = jnp.std(x0, axis=tuple(range(1, x0.ndim)), keepdims=True)
            rescaled = x0 * (std_cond / jnp.maximum(std_cfg, 1e-8))
            x0 = cfg_rescale * rescaled + (1 - cfg_rescale) * x0

        for hook in post_cfg_hooks:
            x0 = hook(x0, eps_cond, eps_uncond, x, sigma)
        return x0

    return model_fn


def make_masked_model_fn(model_fn: Callable, mask: jax.Array, init_latent: jax.Array, predictor) -> Callable:
    """Inpainting latent-composite wrapper (reference
    sd_samplers_cfg_denoiser.py:178-181,204-213): after each denoise, blend
    the model's x0 with the (noised-at-σ... here x0-space) original latent
    using the latent mask. mask==1 → regenerate, 0 → keep original."""

    def wrapped(x, sigma):
        x0 = model_fn(x, sigma)
        return init_latent * (1.0 - mask) + x0 * mask

    return wrapped
