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
import numpy as np



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


class PerStep:
    """Step-scheduled conditioning: `array` has a leading [n_steps] axis and
    the active slice is selected by the current σ's position in the schedule
    (prompt editing `[a:b:N]`, reference prompt_parser.py:294-384 — here the
    per-step conds are precomputed and indexed inside the compiled loop)."""

    def __init__(self, array):
        self.array = array


jax.tree_util.register_pytree_node(
    PerStep,
    lambda ps: ((ps.array,), None),
    lambda aux, children: PerStep(children[0]),
)


def _select_cond(cond: Mapping[str, Any], sigma, sigmas_np) -> Mapping[str, Any]:
    if sigmas_np is None or not any(isinstance(v, PerStep) for v in cond.values()):
        return {k: (v.array[0] if isinstance(v, PerStep) else v) for k, v in cond.items()}
    table = jnp.asarray(-np.asarray(sigmas_np[:-1], np.float32))
    idx = jnp.clip(jnp.searchsorted(table, -sigma, side="right") - 1, 0, len(sigmas_np) - 2)
    return {
        k: (jax.lax.dynamic_index_in_dim(v.array, idx, axis=0, keepdims=False)
            if isinstance(v, PerStep) else v)
        for k, v in cond.items()
    }


def make_cfg_model_fn(
    apply_model: Callable,
    cond: Mapping[str, Any],
    uncond: Optional[Mapping[str, Any]],
    cfg_scale: float,
    cfg_rescale: float = 0.0,
    pre_cfg_hooks: Sequence[Callable] = (),
    post_cfg_hooks: Sequence[Callable] = (),
    sigmas_np=None,
    cond_branches: Optional[Sequence[Mapping[str, Any]]] = None,
    branch_weights: Optional[Sequence[float]] = None,
    branch_masks: Optional[Sequence[Optional[jax.Array]]] = None,
    return_uncond: bool = False,
    cfg_combine_fn: Optional[Callable] = None,
) -> Callable:
    """Build model_fn(x, σ) for the samplers.

    cond/uncond are dicts of conditioning tensors with leading batch dim equal
    to x's batch (e.g. {"context": [B,L,D], "y": [B,adm]}). Passing uncond=None
    skips the uncond branch entirely (reference skip-uncond at cfg==1, :295);
    cfg_scale itself may be a traced value so changing it never recompiles.
    Values may be PerStep (prompt editing); `cond_branches` adds AND-composable
    extra branches combined as uncond + cfg·Σ wᵢ(condᵢ − uncond)
    (reference prompt_parser AND semantics, :210-268).
    """
    skip_uncond = uncond is None

    if cond_branches:
        branches = [cond] + list(cond_branches)
        weights = list(branch_weights or [1.0] * len(branches))
        masks = list(branch_masks) if branch_masks else None
        if masks is not None and all(m is None for m in masks):
            masks = None

        def model_fn_multi(x, sigma):
            sel = [_select_cond(c, sigma, sigmas_np) for c in branches]
            sel_un = _select_cond(uncond, sigma, sigmas_np) if uncond else None
            alln = sel + ([sel_un] if sel_un else [])
            both = {k: jnp.concatenate([c[k] for c in alln], axis=0) for k in alln[0]}
            xn = jnp.concatenate([x] * len(alln), axis=0)
            out = apply_model(xn, sigma, both)
            outs = jnp.split(out, len(alln), axis=0)
            if masks is not None:
                # regional conds, TPU-native: the reference crops each cond
                # to its area and blends by a multiplier map
                # (sampling_function.py:17-63 get_area_and_mult, :296-309
                # accumulate/normalize); here every branch runs full-res
                # (static shapes for XLA) and the same mult·out / Σmult
                # normalized blend happens on the full grid.
                mults = [jnp.asarray(w, jnp.float32) if m is None
                         else m.astype(jnp.float32) * w
                         for m, w in zip(masks, weights)]
                denom = sum(jnp.broadcast_to(m, outs[0].shape) for m in mults)
                denom = jnp.maximum(denom, 1e-6)
                eps_eff = sum(m * e for m, e in zip(mults, outs[: len(branches)])) / denom
            elif sel_un is not None:
                # AND semantics: un + cfg·Σ wᵢ(condᵢ − un) re-expressed as
                # standard CFG against an effective cond so the hook pipeline
                # (pre/post-CFG, cfg_combine_fn, rescale) applies identically
                # to the multi-branch path (reference applies cfg_function and
                # sampler hooks regardless of cond count,
                # sampling_function.py:325).
                eps_un0 = outs[-1]
                total_w = sum(weights)
                eps_eff = sum(w * e for w, e in zip(weights, outs[:-1]))
                eps_eff = eps_eff - (total_w - 1.0) * eps_un0
            else:
                total = sum(weights)
                eps_eff = sum((w / total) * e for w, e in zip(weights, outs))

            if sel_un is None:
                x0 = eps_eff
                for hook in post_cfg_hooks:
                    x0 = hook(x0, eps_eff, eps_eff, x, sigma)
                return (x0, x0) if return_uncond else x0

            eps_un = outs[-1]
            for hook in pre_cfg_hooks:
                eps_eff, eps_un = hook(eps_eff, eps_un, x, sigma)
            if cfg_combine_fn is not None:
                x0 = cfg_combine_fn(eps_eff, eps_un, x, sigma, cfg_scale)
            else:
                x0 = eps_un + cfg_scale * (eps_eff - eps_un)
            if cfg_rescale > 0.0:
                std_cond = jnp.std(eps_eff, axis=tuple(range(1, x0.ndim)), keepdims=True)
                std_cfg = jnp.std(x0, axis=tuple(range(1, x0.ndim)), keepdims=True)
                rescaled = x0 * (std_cond / jnp.maximum(std_cfg, 1e-8))
                x0 = cfg_rescale * rescaled + (1 - cfg_rescale) * x0
            for hook in post_cfg_hooks:
                x0 = hook(x0, eps_eff, eps_un, x, sigma)
            return (x0, eps_un) if return_uncond else x0

        return model_fn_multi

    def model_fn(x, sigma):
        cond_s = _select_cond(cond, sigma, sigmas_np)
        uncond_s = _select_cond(uncond, sigma, sigmas_np) if uncond is not None else None
        if skip_uncond:
            denoised = apply_model(x, sigma, cond_s)
            x0 = denoised
            eps_cond, eps_uncond = denoised, denoised
        else:
            both = {}
            for key in cond_s:
                both[key] = jnp.concatenate([cond_s[key], uncond_s[key]], axis=0)
            x2 = jnp.concatenate([x, x], axis=0)
            out = apply_model(x2, sigma, both)
            eps_cond, eps_uncond = jnp.split(out, 2, axis=0)

            for hook in pre_cfg_hooks:
                eps_cond, eps_uncond = hook(eps_cond, eps_uncond, x, sigma)

            if cfg_combine_fn is not None:
                # replacement for the CFG combination itself (reference
                # set_model_sampler_cfg_function, patcher/base.py:161)
                x0 = cfg_combine_fn(eps_cond, eps_uncond, x, sigma, cfg_scale)
            else:
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
        # CFG++ samplers steer the direction term with the uncond prediction
        # (reference need_last_noise_uncond, sd_samplers_cfg_denoiser.py)
        return (x0, eps_uncond) if return_uncond else x0

    return model_fn


def make_masked_pair_fn(pair_fn: Callable, mask: jax.Array, init_latent: jax.Array) -> Callable:
    """Masked-composite wrapper for pair-returning (CFG++) model fns: the x0
    prediction is composited, the uncond direction term passes through."""

    def wrapped(x, sigma):
        x0, un = pair_fn(x, sigma)
        return init_latent * (1.0 - mask) + x0 * mask, un

    return wrapped


def make_masked_model_fn(model_fn: Callable, mask: jax.Array, init_latent: jax.Array, predictor) -> Callable:
    """Inpainting latent-composite wrapper (reference
    sd_samplers_cfg_denoiser.py:178-181,204-213): after each denoise, blend
    the model's x0 with the (noised-at-σ... here x0-space) original latent
    using the latent mask. mask==1 → regenerate, 0 → keep original."""

    def wrapped(x, sigma):
        x0 = model_fn(x, sigma)
        return init_latent * (1.0 - mask) + x0 * mask

    return wrapped
