"""Kohya HRFix / Deep Shrink: high-res structure fix via early downscale.

Behavioral twin of sd_forge_kohya_hrfix (kohya_hrfix.py:13-35
PatchModelAddDownscale): during the first part of sampling, the UNet's hidden
state is downscaled right after a chosen input block and upscaled back where
the decoder meets a mismatched skip — the model composes at its trained
resolution, then refines at full resolution.

The reference gates the shrink per-call on sigma; in the compiled-scan world
the σ schedule is known ahead, so the generation runs as TWO compiled
segments (shrink hooks active, then off) via Processing.hook_phases — the
same split technique the refiner two-pass uses. Shapes inside each segment
are static, which is what XLA needs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

_METHODS = {"bicubic": "cubic", "bilinear": "linear", "bislerp": "linear",
            "nearest-exact": "nearest", "area": "linear", "nearest": "nearest"}


def _resize(h: jax.Array, new_h: int, new_w: int, method: str) -> jax.Array:
    b, _, _, c = h.shape
    return jax.image.resize(h, (b, new_h, new_w, c),
                            method=_METHODS.get(method, "linear")).astype(h.dtype)


def build_kohya_hooks(
    block_number: int = 3,
    downscale_factor: float = 2.0,
    downscale_after_skip: bool = True,
    downscale_method: str = "bicubic",
    upscale_method: str = "bicubic",
) -> Dict[str, Any]:
    slot = "input_block_patch_after_skip" if downscale_after_skip else "input_block_patch"

    def input_patch(h, block_id):
        if block_id == ("input", block_number):
            b, hh, ww, c = h.shape
            h = _resize(h, max(round(hh / downscale_factor), 1),
                        max(round(ww / downscale_factor), 1), downscale_method)
        return h

    def output_patch(h, skip, block_id):
        if h.shape[1:3] != skip.shape[1:3]:
            h = _resize(h, skip.shape[1], skip.shape[2], upscale_method)
        return h, skip

    return {slot: (input_patch,), "output_block_patch": (output_patch,)}


def attach(p, args: Dict[str, Any]) -> None:
    """alwayson_scripts wiring: sets a two-phase hook schedule
    [start..end_percent: shrink on] [rest: off] (reference gates on
    percent_to_sigma, kohya_hrfix.py:10-18)."""
    hooks = build_kohya_hooks(
        block_number=int(args.get("block_number", 3)),
        downscale_factor=float(args.get("downscale_factor", 2.0)),
        downscale_after_skip=bool(args.get("downscale_after_skip", True)),
        downscale_method=args.get("downscale_method", "bicubic"),
        upscale_method=args.get("upscale_method", "bicubic"),
    )
    start = float(args.get("start_percent", 0.0))
    end = float(args.get("end_percent", 0.35))
    phases = []
    if start > 0:
        phases.append((start, {}))
    phases.append((end, hooks))
    phases.append((1.0, {}))
    p.hook_phases = phases
    p.extra_generation_params["Kohya HRFix"] = (
        f"block {args.get('block_number', 3)} x{args.get('downscale_factor', 2.0)} "
        f"until {end}")
