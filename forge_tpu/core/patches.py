"""LoRA / LyCORIS weight patches as functional pytree transforms.

The reference's patch machinery (backend/patcher/lora.py:85-324 merge math,
ModelPatcher patch dict backend/patcher/base.py:91) re-expressed for JAX:
a LoRA file parses into {model_dotted_key: Patch}; applying a patch set is a
pure function params → params' (copy-on-write at the leaf level — untouched
leaves are shared, patched leaves are recomputed on device in f32 and cast
back). Plain weights merge offline; quantized weights get ONLINE patches:
low-rank epilogue factors (or a dense delta) attached to the QuantTensor and
applied inside the quantized matmul (ops/quant.py lora_epilogue) — the
reference's flagship LoRA-on-NF4/GGUF mode (backend/operations.py:16-53).

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
    ".a1.weight", ".a2.weight", ".b1.weight", ".b2.weight",  # glora
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
    if "a1.weight" in t:
        return Patch("glora", t, alpha, dora)
    if "diff" in t:
        return Patch("diff", t, alpha, dora)
    raise ValueError(f"unrecognized patch tensors: {list(t)}")


# ---------------------------------------------------------------------------
# merge math (reference patcher/lora.py:85-324)


def _delta(patch: Patch, strength: float, weight_shape, hwio: bool,
           weight=None) -> jnp.ndarray:
    t = patch.tensors
    if patch.kind == "glora":
        # reference patcher/lora.py:268-301: ΔW = W·a1·a2 + b1·b2 (new format;
        # old lycoris format is b2·b1 + W·a2·a1, detected by shape chirality)
        hp = jax.lax.Precision.HIGHEST
        a1 = jnp.asarray(t["a1.weight"], jnp.float32).reshape(t["a1.weight"].shape[0], -1)
        a2 = jnp.asarray(t["a2.weight"], jnp.float32).reshape(t["a2.weight"].shape[0], -1)
        b1 = jnp.asarray(t["b1.weight"], jnp.float32).reshape(t["b1.weight"].shape[0], -1)
        b2 = jnp.asarray(t["b2.weight"], jnp.float32).reshape(t["b2.weight"].shape[0], -1)
        old_glora = (b2.shape[1] == b1.shape[0] == a1.shape[0] == a2.shape[1])
        if (b2.shape[0] == b1.shape[1] == a1.shape[1] == a2.shape[0]) and not (
                old_glora and a2.shape[0] == weight_shape[0] == weight_shape[-1]):
            old_glora = False
        rank = a1.shape[0] if old_glora else a2.shape[0]
        alpha = (patch.alpha / rank) if patch.alpha is not None else 1.0
        w2d = jnp.asarray(weight, jnp.float32).reshape(weight_shape[0] if not hwio else weight_shape[3], -1) \
            if weight is not None else jnp.zeros((weight_shape[0], int(np.prod(weight_shape[1:]))), jnp.float32)
        if hwio and weight is not None:
            w2d = jnp.transpose(jnp.asarray(weight, jnp.float32), (3, 2, 0, 1)).reshape(weight_shape[3], -1)
        if old_glora:
            delta = jnp.matmul(b2, b1, precision=hp) + jnp.matmul(
                jnp.matmul(w2d, a2, precision=hp), a1, precision=hp)
        else:
            delta = jnp.matmul(jnp.matmul(w2d, a1, precision=hp), a2, precision=hp) \
                + jnp.matmul(b1, b2, precision=hp)
        delta = delta * alpha
        if hwio:
            o = weight_shape[3]
            i, kh, kw = weight_shape[2], weight_shape[0], weight_shape[1]
            delta = delta.reshape(o, i, kh, kw).transpose(2, 3, 1, 0)
        else:
            delta = delta.reshape(weight_shape)
        return strength * delta
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
            set_path(out, key, _attach_online(w, plist))
            continue
        hwio = w.ndim == 4
        new_w = w.astype(jnp.float32)
        for patch, strength in plist:
            new_w = new_w + _delta(patch, strength, w.shape, hwio, weight=new_w)
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


def _attach_online(qleaf, plist) -> Any:
    """Online (in-forward) LoRA over a quantized weight: the packed codes are
    untouched; plain low-rank patches become (down, up) epilogue factors and
    everything else (loha/lokr/glora/diff/DoRA) becomes one dense delta —
    both consumed by ops.quant.lora_epilogue inside the quantized matmul.
    Reference: backend/operations.py:16-53, mode choice sd_forge_lora/
    networks.py:102-109 (quantized → online)."""
    from ..ops import quant
    from ..ops.quant import QuantTensor

    out_dim, in_dim = qleaf["shape"]
    factors: List[Tuple[np.ndarray, np.ndarray]] = []
    dense = None
    base = None  # dequantized base, only materialized if a dense patch needs it
    for patch, strength in plist:
        simple_lora = (patch.kind == "lora" and patch.dora_scale is None
                       and np.asarray(patch.tensors["down"]).ndim <= 2)
        if simple_lora:
            up = np.asarray(patch.tensors["up"], np.float32).reshape(
                patch.tensors["up"].shape[0], -1)
            down = np.asarray(patch.tensors["down"], np.float32).reshape(
                patch.tensors["down"].shape[0], -1)
            rank = down.shape[0]
            scale = (patch.alpha / rank) if patch.alpha is not None else 1.0
            factors.append((down, up * (scale * strength)))
        else:
            if base is None:
                base = quant.dequantize(qleaf, jnp.float32)
            d = _delta(patch, strength, (out_dim, in_dim), hwio=False, weight=base)
            if patch.dora_scale is not None:
                merged = base + d
                ds = jnp.asarray(patch.dora_scale, jnp.float32).reshape(-1)
                norm = jnp.sqrt(jnp.sum(jnp.square(merged), axis=1) + 1e-8)
                merged = merged * (ds / norm)[:, None]
                d = merged - base
            dense = d if dense is None else dense + d
    new = QuantTensor.from_dict(qleaf) if not isinstance(qleaf, QuantTensor) else \
        QuantTensor(qleaf.kind, qleaf.shape, qleaf.codes, qleaf.scales,
                    qleaf.codes2d, qleaf.scales2d, qleaf.lora_down,
                    qleaf.lora_up, qleaf.lora_dense)
    if factors:
        downs = np.concatenate([d for d, _ in factors], axis=0)   # [R, in]
        ups = np.concatenate([u for _, u in factors], axis=1)     # [out, R]
        if new.lora_down is not None:  # stack onto an existing epilogue
            downs = np.concatenate([np.asarray(new.lora_down, np.float32), downs], 0)
            ups = np.concatenate([np.asarray(new.lora_up, np.float32), ups], 1)
        new.lora_down = jnp.asarray(downs, jnp.bfloat16)
        new.lora_up = jnp.asarray(ups, jnp.bfloat16)
    if dense is not None:
        prev = new.lora_dense
        new.lora_dense = jnp.asarray(
            dense if prev is None else dense + prev.astype(jnp.float32), jnp.bfloat16)
    return new


def _shallow_tree_copy(tree):
    if isinstance(tree, dict):
        return {k: _shallow_tree_copy(v) for k, v in tree.items()}
    return tree
