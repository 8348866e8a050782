"""ControlLLLite: lightweight SDXL control via attention q/k/v offsets.

Behavioral twin of sd_forge_controlllite (lib_controllllite.py:28-237):
the checkpoint carries one tiny module per attention projection, named
``lllite_unet_<block-path>_attn{1,2}_to_{q,k,v}``. Each module embeds the
control image through a small conv stack (``conditioning1``) and produces a
per-token offset  x += up(mid(cat(cond_emb, down(x)))) · multiplier.

Here the modules are pure-fn pytrees applied through the attn1/attn2
``*_patch`` hook slots; the cond embedding is computed once per module shape
at trace time (it is input-independent), so the compiled loop carries it as
a constant — the reference recomputes/caches it per call.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn


def split_lllite_modules(sd: Mapping[str, np.ndarray]) -> Dict[str, Dict[str, Any]]:
    """Group flat checkpoint keys by module name and nest the remainder
    (lib_controllllite.py:33-43)."""
    modules: Dict[str, Dict[str, Any]] = {}
    for key, value in sd.items():
        module_name, _, weight_name = key.partition(".")
        tree = modules.setdefault(module_name, {})
        parts = weight_name.split(".")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return modules


def _module_meta(weights: Dict[str, Any]) -> Dict[str, Any]:
    """Infer depth / conv-vs-linear / dims from shapes (lib_controllllite.py:48-56).
    Conv kernels arrive HWIO (state_dict transposition), torch linear [O,I]."""
    cond1 = weights["conditioning1"]
    down0 = weights["down"]["0"]["weight"]
    is_conv2d = down0.ndim == 4
    if "4" in cond1:
        depth = 3
    elif cond1["2"]["weight"].shape[0] == 4:  # HWIO: kernel h == 4
        depth = 2
    else:
        depth = 1
    in_dim = down0.shape[2] if is_conv2d else down0.shape[1]
    mlp_dim = down0.shape[3] if is_conv2d else down0.shape[0]
    return {"depth": depth, "is_conv2d": is_conv2d, "in_dim": in_dim,
            "mlp_dim": mlp_dim}


def _cond_embed(weights: Dict[str, Any], cond_image: jax.Array, depth: int) -> jax.Array:
    """conditioning1 stack (lib_controllllite.py:137-152): strided convs that
    bring the pixel-space hint to token resolution. NHWC."""
    c1 = weights["conditioning1"]
    x = nn.conv2d(cond_image, c1["0"], stride=4)
    x = jax.nn.relu(x)
    if depth == 1:
        x = nn.conv2d(x, c1["2"], stride=2)
    elif depth == 2:
        x = nn.conv2d(x, c1["2"], stride=4)
    else:
        x = nn.conv2d(x, c1["2"], stride=4)
        x = jax.nn.relu(x)
        x = nn.conv2d(x, c1["4"], stride=2)
    return x


def _apply_module(weights: Dict[str, Any], meta: Dict[str, Any],
                  cond_emb: jax.Array, x: jax.Array, multiplier: float) -> jax.Array:
    """x [B,L,C] (linear modules; SDXL attn projections are linear) →
    offset (lib_controllllite.py:195-237 forward)."""
    ce = cond_emb
    if not meta["is_conv2d"]:
        b, h, w, c = ce.shape
        ce = ce.reshape(b, h * w, c)
    if x.shape[0] != ce.shape[0]:
        reps = (x.shape[0] // ce.shape[0],) + (1,) * (ce.ndim - 1)
        ce = jnp.tile(ce, reps)
    ce = ce.astype(x.dtype)
    down = jax.nn.relu(nn.linear(x, weights["down"]["0"]))
    mid = jax.nn.relu(nn.linear(jnp.concatenate([ce, down], axis=-1),
                                weights["mid"]["0"]))
    return nn.linear(mid, weights["up"]["0"]) * multiplier


def _module_prefix(extra: Mapping[str, Any]) -> str:
    block = extra["block"]
    idx = extra.get("block_index", 0)
    if block[0] == "input":
        return f"lllite_unet_input_blocks_{block[1]}_1_transformer_blocks_{idx}"
    if block[0] == "middle":
        return f"lllite_unet_middle_block_1_transformer_blocks_{idx}"
    return f"lllite_unet_output_blocks_{block[1]}_1_transformer_blocks_{idx}"


def build_lllite_hooks(sd: Mapping[str, np.ndarray], cond_image: np.ndarray,
                       multiplier: float = 1.0) -> Dict[str, Any]:
    """→ hook manifest with attn1_patch/attn2_patch entries.

    cond_image: [H,W,3] uint8/float at generation resolution; scaled to
    [-1, 1] like the reference (:78-79)."""
    img = np.asarray(cond_image, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    img = img * 2.0 - 1.0
    cond = jnp.asarray(img[None])  # [1,H,W,3]

    modules = split_lllite_modules(sd)
    metas = {name: _module_meta(w) for name, w in modules.items()}
    emb_cache: Dict[str, jax.Array] = {}

    def offsets(q, k, v, extra, which):
        pfx = f"{_module_prefix(extra)}_{which}"
        for proj, t in (("to_q", q), ("to_k", k), ("to_v", v)):
            name = f"{pfx}_{proj}"
            if name in modules:
                if name not in emb_cache:
                    emb_cache[name] = _cond_embed(modules[name], cond,
                                                  metas[name]["depth"])
                delta = _apply_module(modules[name], metas[name],
                                      emb_cache[name], t, multiplier)
                if proj == "to_q":
                    q = t + delta
                elif proj == "to_k":
                    k = t + delta
                else:
                    v = t + delta
        return q, k, v

    def attn1_patch(q, k, v, extra):
        return offsets(q, k, v, extra, "attn1")

    def attn2_patch(q, k, v, extra):
        return offsets(q, k, v, extra, "attn2")

    return {"attn1_patch": (attn1_patch,), "attn2_patch": (attn2_patch,)}


def attach(p, args: Dict[str, Any], sd: Optional[Mapping[str, np.ndarray]] = None,
           cond_image: Optional[np.ndarray] = None) -> None:
    """alwayson wiring: {"model": path-or-sd, "image": b64/array,
    "weight": 1.0} (reference forge_controllllite.py script)."""
    if sd is None:
        from ..core.state_dict import load_state_dict, transform_for_jax

        sd = transform_for_jax(load_state_dict(args["model"]))
    # weights are traced into the denoise jit closure: keep them on device
    # so XLA gets array consts, not numpy literals to fold
    from ..core.state_dict import as_device_tree

    sd = as_device_tree(dict(sd))
    if cond_image is None:
        cond_image = np.asarray(args["image"])
    hooks = build_lllite_hooks(sd, cond_image,
                               multiplier=float(args.get("weight", 1.0)))
    from ..pipeline.processing import _merge_hooks

    p.unet_hooks = _merge_hooks(p.unet_hooks, hooks)
    p.extra_generation_params["ControlLLLite"] = args.get("model", "attached")
