"""LoRA / LyCORIS weight patches as functional pytree transforms.

The reference's patch machinery (backend/patcher/lora.py:85-324 merge math,
ModelPatcher patch dict backend/patcher/base.py:91) re-expressed for JAX:
a LoRA file parses into {model_dotted_key: Patch}; applying a patch set is a
pure function params → params' (copy-on-write at the leaf level — untouched
leaves are shared, patched leaves are recomputed on device in f32 and cast
back). Offline-merge only for now; online (in-forward) merge arrives with the
quantized paths.

Key mapping: kohya/webui LoRA names are the model's own ldm keys with '.'
replaced by '_' and a lora_unet_/lora_te_ prefix; we invert against the actual
key set of the loaded model (the reference resolves the same way through
packages_3rdparty/webui_lora_collection/lora.py)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tree import get_path, iter_leaves, set_path


@dataclasses.dataclass
class Patch:
    kind: str  # lora | lokr | loha | glora | diff
    tensors: Dict[str, np.ndarray]
    alpha: Optional[float] = None
    dora_scale: Optional[np.ndarray] = None


# ---------------------------------------------------------------------------
# parsing


_SUFFIXES = (
    ".lora_up.weight", ".lora_down.weight", ".alpha",
    ".lora_A.weight", ".lora_B.weight",
    ".hada_w1_a", ".hada_w1_b", ".hada_w2_a", ".hada_w2_b",
    ".lokr_w1", ".lokr_w2", ".lokr_w1_a", ".lokr_w1_b", ".lokr_w2_a", ".lokr_w2_b",
    ".diff", ".diff_b", ".dora_scale",
)


def group_lora_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        for suf in _SUFFIXES:
            if k.endswith(suf):
                base = k[: -len(suf)]
                groups.setdefault(base, {})[suf[1:]] = v
                break
    return groups


def _build_key_index(model_keys) -> Dict[str, str]:
    """underscore-name → real dotted key (weights only)."""
    out = {}
    for k in model_keys:
        if k.endswith(".weight"):
            stem = k[: -len(".weight")]
            out[stem.replace(".", "_")] = stem
    return out


def match_lora(
    lora_sd: Mapping[str, np.ndarray],
    unet_keys,
    te_keys_by_name: Optional[Mapping[str, Any]] = None,
) -> Tuple[Dict[str, Dict[str, Patch]], List[str]]:
    """→ ({'unet': {model_key: Patch}, 'te:<name>': {...}}, unmatched_names)."""
    groups = group_lora_keys(lora_sd)
    unet_index = _build_key_index(unet_keys)
    te_indexes = {
        name: _build_key_index(keys) for name, keys in (te_keys_by_name or {}).items()
    }

    result: Dict[str, Dict[str, Patch]] = {"unet": {}}
    for name in te_indexes:
        result[f"te:{name}"] = {}
    unmatched: List[str] = []

    for base, tensors in groups.items():
        target_map = None
        stem = None
        if base.startswith("lora_unet_"):
            target_map, stem = result["unet"], unet_index.get(base[len("lora_unet_"):])
        elif base.startswith("lora_te_") or base.startswith("lora_te1_"):
            pfx = "lora_te1_" if base.startswith("lora_te1_") else "lora_te_"
            for name, idx in te_indexes.items():
                s = idx.get(base[len(pfx):])
                if s is not None:
                    target_map, stem = result[f"te:{name}"], s
                    break
        elif base.startswith("lora_te2_"):
            for name, idx in te_indexes.items():
                if "g" in name:
                    s = idx.get(base[len("lora_te2_"):])
                    if s is not None:
                        target_map, stem = result[f"te:{name}"], s
                        break
        else:
            # bare dotted-key loras ("diffusion_model.xxx.lora_up.weight")
            cand = base.replace("diffusion_model.", "")
            if cand.replace(".", "_") in unet_index:
                target_map, stem = result["unet"], unet_index[cand.replace(".", "_")]

        if target_map is None or stem is None:
            unmatched.append(base)
            continue

        target_map[stem + ".weight"] = _make_patch(tensors)

    return result, unmatched


def _make_patch(t: Dict[str, np.ndarray]) -> Patch:
    alpha = float(t["alpha"]) if "alpha" in t else None
    dora = t.get("dora_scale")
    if "lora_up.weight" in t or "lora_B.weight" in t:
        up = t.get("lora_up.weight", t.get("lora_B.weight"))
        down = t.get("lora_down.weight", t.get("lora_A.weight"))
        return Patch("lora", {"up": up, "down": down}, alpha, dora)
    if "hada_w1_a" in t:
        return Patch("loha", t, alpha, dora)
    if "lokr_w1" in t or "lokr_w1_a" in t:
        return Patch("lokr", t, alpha, dora)
    if "diff" in t:
        return Patch("diff", t, alpha, dora)
    raise ValueError(f"unrecognized patch tensors: {list(t)}")


# ---------------------------------------------------------------------------
# merge math (reference patcher/lora.py:85-324)


def _delta(patch: Patch, strength: float, weight_shape, hwio: bool) -> jnp.ndarray:
    t = patch.tensors
    if patch.kind == "lora":
        up = jnp.asarray(t["up"], jnp.float32)
        down = jnp.asarray(t["down"], jnp.float32)
        rank = down.shape[0]
        scale = (patch.alpha / rank) if patch.alpha is not None else 1.0
        up2 = up.reshape(up.shape[0], -1)
        down2 = down.reshape(down.shape[0], -1)
        # HIGHEST: weight merges must be f32-exact (default MXU precision
        # truncates to bf16 passes)
        delta = jnp.matmul(up2, down2, precision=jax.lax.Precision.HIGHEST) * scale
    elif patch.kind == "loha":
        hp = jax.lax.Precision.HIGHEST
        w1 = jnp.matmul(jnp.asarray(t["hada_w1_a"], jnp.float32),
                        jnp.asarray(t["hada_w1_b"], jnp.float32).reshape(t["hada_w1_b"].shape[0], -1),
                        precision=hp)
        w2 = jnp.matmul(jnp.asarray(t["hada_w2_a"], jnp.float32),
                        jnp.asarray(t["hada_w2_b"], jnp.float32).reshape(t["hada_w2_b"].shape[0], -1),
                        precision=hp)
        rank = t["hada_w1_b"].shape[0]
        scale = (patch.alpha / rank) if patch.alpha is not None else 1.0
        delta = (w1 * w2) * scale
    elif patch.kind == "lokr":
        if "lokr_w1" in t:
            w1 = jnp.asarray(t["lokr_w1"], jnp.float32)
        else:
            w1 = jnp.matmul(jnp.asarray(t["lokr_w1_a"], jnp.float32),
                            jnp.asarray(t["lokr_w1_b"], jnp.float32),
                            precision=jax.lax.Precision.HIGHEST)
        if "lokr_w2" in t:
            w2 = jnp.asarray(t["lokr_w2"], jnp.float32)
        else:
            w2 = jnp.matmul(jnp.asarray(t["lokr_w2_a"], jnp.float32),
                            jnp.asarray(t["lokr_w2_b"], jnp.float32),
                            precision=jax.lax.Precision.HIGHEST)
            rank = t["lokr_w2_b"].shape[0]
        scale = 1.0
        if patch.alpha is not None and "lokr_w2_b" in t:
            scale = patch.alpha / t["lokr_w2_b"].shape[0]
        delta = jnp.kron(w1, w2.reshape(w2.shape[0], -1)) * scale
    elif patch.kind == "diff":
        delta = jnp.asarray(t["diff"], jnp.float32).reshape(-1)
        delta = delta.reshape(t["diff"].shape)
        if hwio and delta.ndim == 4:
            delta = jnp.transpose(delta, (2, 3, 1, 0))
        return strength * delta.reshape(weight_shape)
    else:
        raise ValueError(patch.kind)

    if hwio:
        # weight is HWIO [kh,kw,I,O]; delta is [O, I*kh*kw]
        o = weight_shape[3]
        i, kh, kw = weight_shape[2], weight_shape[0], weight_shape[1]
        delta = delta.reshape(o, i, kh, kw).transpose(2, 3, 1, 0)
    else:
        delta = delta.reshape(weight_shape)
    return strength * delta


def apply_patches(
    params: Dict[str, Any],
    patch_sets: List[Tuple[Dict[str, Patch], float]],
) -> Dict[str, Any]:
    """params tree + [(patches_by_key, strength)] → new tree (COW)."""
    merged: Dict[str, List[Tuple[Patch, float]]] = {}
    for patches, strength in patch_sets:
        if strength == 0:
            continue
        for key, patch in patches.items():
            merged.setdefault(key, []).append((patch, strength))

    out = _shallow_tree_copy(params)
    for key, plist in merged.items():
        w = get_path(out, key)
        if w is None:
            continue
        from ..ops.quant import is_quantized

        if is_quantized(w):
            # online (in-forward) LoRA over quantized weights lands with the
            # fused-kernel epilogue in a later round; skip with a notice
            print(f"lora: skipping quantized weight {key}")
            continue
        hwio = w.ndim == 4
        new_w = w.astype(jnp.float32)
        for patch, strength in plist:
            new_w = new_w + _delta(patch, strength, w.shape, hwio)
            if patch.dora_scale is not None:
                # DoRA: rescale merged weight rows to the learned magnitude
                ds = jnp.asarray(patch.dora_scale, jnp.float32).reshape(-1)
                axis = tuple(i for i in range(new_w.ndim) if i != (3 if hwio else 0))
                norm = jnp.sqrt(jnp.sum(jnp.square(new_w), axis=axis, keepdims=False) + 1e-8)
                scale = ds / norm
                if hwio:
                    new_w = new_w * scale.reshape(1, 1, 1, -1)
                else:
                    new_w = new_w * scale.reshape(-1, *([1] * (new_w.ndim - 1)))
        set_path(out, key, new_w.astype(w.dtype))
    return out


def _shallow_tree_copy(tree):
    if isinstance(tree, dict):
        return {k: _shallow_tree_copy(v) for k, v in tree.items()}
    return tree
