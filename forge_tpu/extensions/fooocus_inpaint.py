"""Fooocus inpaint: inpaint-head feature injection + uint8-quantized weight patch.

Behavioral twin of sd_forge_fooocus_inpaint (forge_fooocus_inpaint.py:18-127):
  1. ``InpaintHead``: a 5→320 conv over [latent_mask ‖ init_latent] whose
     output is added to the UNet hidden state right after input block 0
     (:88-95) — gives the model explicit knowledge of what is masked.
  2. The Fooocus patch checkpoint stores per-weight diffs quantized to uint8
     with per-tensor min/max; dequant is  w/255·(max−min)+min, added to the
     base weight (:41-49 calculate_weight_fooocus). Here dequant happens at
     load and the diffs ride the existing "diff" patch kind (core/patches.py)
     — one merged pytree, no per-forward cost.

The reference swaps patched/original model by sigma window via a
conditioning_modifier (:105-123); the head-feature hook honors the same
window through Processing.hook_phases. Weight diffs stay merged for the whole
run when a partial window is requested (documented deviation — the diffs are
small and the reference default window is the full run).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.patches import Patch
from ..ops import nn


def is_fooocus_patch(sd: Mapping[str, Any]) -> bool:
    """Detection (forge_fooocus_inpaint.py:55-58): values are 3-element
    [uint8 diff, min, max] groups."""
    v = sd.get("diffusion_model.time_embed.0.weight")
    return v is not None and not hasattr(v, "ndim") and len(v) == 3


def dequantize_fooocus(value) -> np.ndarray:
    """w/255·(max−min)+min (forge_fooocus_inpaint.py:41-49)."""
    w1, w_min, w_max = value
    w1 = np.asarray(w1, np.float32)
    return (w1 / 255.0) * (np.asarray(w_max, np.float32)
                           - np.asarray(w_min, np.float32)) + np.asarray(w_min, np.float32)


def load_fooocus_patches(sd: Mapping[str, Any],
                         strength: float = 1.0) -> Tuple[Dict[str, Patch], float]:
    """→ ({unet-tree key: diff Patch}, strength) for core.patches.apply_patches.
    Checkpoint keys are ``diffusion_model.*``; our UNet tree drops that
    prefix. Conv diffs stay OIHW — the diff kind transposes for HWIO weights."""
    patches: Dict[str, Patch] = {}
    for key, value in sd.items():
        if hasattr(value, "ndim") or len(value) != 3:
            continue
        tree_key = key[len("diffusion_model."):] if key.startswith("diffusion_model.") else key
        patches[tree_key] = Patch(kind="diff",
                                  tensors={"diff": dequantize_fooocus(value)})
    return patches, strength


def inpaint_head_feature(head_weight: np.ndarray, latent_mask: jax.Array,
                         init_latent: jax.Array) -> jax.Array:
    """InpaintHead forward (forge_fooocus_inpaint.py:18-25): replicate-pad
    then 3×3 conv of [mask ‖ latent] (5 ch) → model_channels. NHWC; the head
    weight arrives HWIO like every conv (core/state_dict transform)."""
    feed = jnp.concatenate([latent_mask.astype(jnp.float32),
                            init_latent.astype(jnp.float32)], axis=-1)
    feed = jnp.pad(feed, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return nn.conv2d(feed, {"weight": jnp.asarray(head_weight)})


def build_inpaint_head_hooks(feature: jax.Array) -> Dict[str, Any]:
    def input_block_patch(h, block_id):
        if block_id == ("input", 0):
            f = feature
            if h.shape[0] != f.shape[0]:
                f = jnp.tile(f, (h.shape[0] // f.shape[0], 1, 1, 1))
            h = h + f.astype(h.dtype)
        return h

    return {"input_block_patch": (input_block_patch,)}


def attach(p, args: Dict[str, Any],
           patch_sd: Optional[Mapping[str, Any]] = None,
           head_weight: Optional[np.ndarray] = None) -> None:
    """Wire the head + weight patches into the request. Needs the engine for
    VAE encode of the init image, so it rides deferred_hooks. args:
    {"patch": path, "head": path, "weight": 1.0, "start_percent": 0.0,
    "end_percent": 1.0}."""
    if patch_sd is None:
        from ..core.state_dict import load_state_dict

        patch_sd = load_state_dict(args["patch"])
    if head_weight is None:
        from ..core.state_dict import load_state_dict, transform_for_jax

        head_sd = transform_for_jax(load_state_dict(args["head"]))
        head_weight = head_sd.get("head", next(iter(head_sd.values())))
    strength = float(args.get("weight", 1.0))
    start = float(args.get("start_percent", 0.0))
    end = float(args.get("end_percent", 1.0))

    def deferred(engine, pp, cond, uncond):
        if pp.init_images is None or pp.inpaint_mask is None:
            raise ValueError("fooocus inpaint needs init_images + inpaint_mask")
        img = np.asarray(pp.init_images[0], np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        img = img * 2.0 - 1.0
        init_latent = engine.encode_first_stage(jnp.asarray(img[None]))
        mask = np.asarray(pp.inpaint_mask, np.float32)
        if mask.max() > 1.5:
            mask = mask / 255.0
        h8, w8 = init_latent.shape[1], init_latent.shape[2]
        latent_mask = jnp.asarray(mask)[None, :, :, None]
        latent_mask = jax.image.resize(latent_mask, (1, h8, w8, 1), "nearest")
        latent_mask = jnp.round(latent_mask)

        feature = inpaint_head_feature(head_weight, latent_mask,
                                       init_latent.astype(jnp.float32))
        hooks = build_inpaint_head_hooks(feature)
        if start > 0 or end < 1:
            phases = ([(start, {})] if start > 0 else []) + [(end, hooks), (1.0, {})]
            pp.hook_phases = phases
        else:
            from ..pipeline.processing import _merge_hooks

            pp.unet_hooks = _merge_hooks(pp.unet_hooks, hooks)

        patches, s = load_fooocus_patches(patch_sd, strength)
        if patches:
            # per-request COW patch of the weight tree (the reference clones
            # the patcher per generation, forge_fooocus_inpaint.py:77) — the
            # engine's base params are never mutated
            def override(tree):
                from ..core.patches import apply_patches

                return apply_patches(tree, [(patches, s)])

            pp._unet_param_override = override
        pp.extra_generation_params["Fooocus inpaint"] = "True"

    p.deferred_hooks = list(p.deferred_hooks or []) + [deferred]
