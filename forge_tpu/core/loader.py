"""Checkpoint → device parameter trees.

The TPU re-expression of the reference's forge_loader (backend/loader.py:497):
load file → guess architecture → split components → per-component key
normalization (open_clip → HF text_model space, like transformers_convert,
backend/state_dict.py:43-83) → conv-kernel transposition for NHWC → dtype
policy cast → nested pytree on device.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import guess as guess_mod
from .state_dict import load_state_dict, transform_for_jax
from .tree import nest


def convert_open_clip(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """open_clip text-tower keys → HF CLIPTextModel `text_model.*` keys."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "positional_embedding":
            out["text_model.embeddings.position_embedding.weight"] = v
        elif k == "token_embedding.weight":
            out["text_model.embeddings.token_embedding.weight"] = v
        elif k.startswith("ln_final."):
            out["text_model.final_layer_norm." + k[len("ln_final."):]] = v
        elif k == "text_projection":
            out["text_projection.weight"] = np.ascontiguousarray(v.T)
        elif k.startswith("transformer.resblocks."):
            rest = k[len("transformer.resblocks."):]
            idx, sub = rest.split(".", 1)
            base = f"text_model.encoder.layers.{idx}."
            if sub.startswith("ln_1."):
                out[base + "layer_norm1." + sub[5:]] = v
            elif sub.startswith("ln_2."):
                out[base + "layer_norm2." + sub[5:]] = v
            elif sub.startswith("mlp.c_fc."):
                out[base + "mlp.fc1." + sub[9:]] = v
            elif sub.startswith("mlp.c_proj."):
                out[base + "mlp.fc2." + sub[11:]] = v
            elif sub.startswith("attn.out_proj."):
                out[base + "self_attn.out_proj." + sub[14:]] = v
            elif sub.startswith("attn.in_proj_"):
                kind = sub[len("attn.in_proj_"):]  # 'weight' or 'bias'
                q, kk, vv = np.split(v, 3, axis=0)
                out[base + f"self_attn.q_proj.{kind}"] = q
                out[base + f"self_attn.k_proj.{kind}"] = kk
                out[base + f"self_attn.v_proj.{kind}"] = vv
        # attn_mask / logit_scale intentionally dropped
    return out


def _to_device_tree(sd: Mapping[str, np.ndarray], dtype) -> Dict[str, Any]:
    """Grouped-stack upload (state_dict.packed_device_put). Per-leaf
    `jnp.asarray(v, dtype)` is an eager convert_element_type per tensor —
    profiled at 91 s of the 106 s SD1.5 load over the tunnel (1,130
    round-trips + 76 one-off convert programs); packed puts land the same
    tree in ~30 s. Prequantized (gguf/bnb) dict leaves keep their own
    device path."""
    sd = transform_for_jax(sd)
    from .state_dict import _device_safe_dtype, packed_device_put

    np_dtype = np.dtype(dtype)
    host: Dict[str, np.ndarray] = {}
    quant: Dict[str, Any] = {}
    for k in list(sd.keys()):
        v = sd.pop(k)
        if isinstance(v, dict):  # prequantized (gguf/bnb) leaf
            from ..ops import quant as quant_mod
            from ..ops.dequant_matmul import prepare_for_kernel

            q = prepare_for_kernel(v) if len(v.get("shape", ())) == 2 else dict(v)
            quant[k] = quant_mod.leaf_to_device(q)
        else:
            host[k] = v

    keys = list(host.keys())
    tgts = [np_dtype if host[k].dtype in (np.float64, np.float32, np.float16)
            else _device_safe_dtype(host[k].dtype) for k in keys]
    dev = dict(zip(keys, packed_device_put([host[k] for k in keys], tgts)))
    dev.update(quant)
    return nest(dev)


QUANT_MIN_SIZE = 1 << 16  # leave small tensors in full precision


def _to_quantized_tree(sd: Mapping[str, np.ndarray], kind: str, dtype) -> Dict[str, Any]:
    """Quantize the big matmul weights (host-side) into block formats with
    the fused-kernel tile layout; everything else loads normally. The
    runtime analog of the reference's on-load quantization modes
    (modules_forge/main_entry.py unet storage dtype radio)."""
    from ..ops import quant as quant_mod
    from ..ops.dequant_matmul import prepare_for_kernel
    from .tree import map_leaves

    sd = transform_for_jax(sd)
    nested = nest(dict(sd))

    # fp8 storage modes (reference main_entry.py unet storage dtype radio:
    # float8-e4m3fn / float8-e5m2): weights live in HBM at 1 byte/param and
    # upcast to the compute dtype at the matmul — halves weight HBM vs bf16
    # with no custom kernel (XLA fuses the convert into the dot/conv).
    fp8_dtype = {"fp8": jnp.float8_e4m3fn, "fp8_e4m3": jnp.float8_e4m3fn,
                 "fp8_e5m2": jnp.float8_e5m2}.get(kind)

    def visit(path, leaf):
        arr = np.asarray(leaf)
        big = arr.size >= QUANT_MIN_SIZE and not any(
            t in path for t in ("norm", "emb", "bias"))
        if fp8_dtype is not None:
            if big and arr.ndim >= 2:
                return jnp.asarray(arr.astype(np.float32), dtype=fp8_dtype)
        elif arr.ndim == 2 and big:
            q = prepare_for_kernel(quant_mod.quantize(arr, kind))
            return quant_mod.leaf_to_device(q)
        if arr.dtype in (np.float64, np.float32, np.float16):
            return jnp.asarray(arr, dtype=dtype)
        return jnp.asarray(arr)

    return map_leaves(visit, nested)


class LoadedCheckpoint:
    """Split + normalized + device-resident components of one checkpoint."""

    def __init__(self, family, prediction, context_dim, unet, vae, text_encoders):
        self.family = family
        self.prediction = prediction
        self.context_dim = context_dim
        self.unet = unet
        self.vae = vae
        self.text_encoders = text_encoders  # name -> nested params


def load_checkpoint_parts(
    path_or_sd,
    dtype=None,
    vae_dtype=None,
    text_dtype=None,
    additional_modules: Optional[Dict[str, str]] = None,
    unet_quant: Optional[str] = None,  # "nf4" | "q8_0" | "q4_0"
) -> LoadedCheckpoint:
    """Main entry: checkpoint path (or raw flat state dict) → components.

    `additional_modules` maps component name → file path for user-supplied
    VAE / text-encoder overrides (the reference's replace_state_dict merge,
    backend/loader.py:181-439).
    """
    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    vae_dtype = vae_dtype or dtype
    text_dtype = text_dtype or dtype

    sd = load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else dict(path_or_sd)

    if additional_modules:
        for name, path in additional_modules.items():
            extra = load_state_dict(path)
            if name == "vae":
                if any(k.startswith("first_stage_model.") for k in extra):
                    extra = {k[len("first_stage_model."):]: v for k, v in extra.items()}
                sd = {k: v for k, v in sd.items() if not k.startswith("first_stage_model.")}
                sd.update({f"first_stage_model.{k}": v for k, v in extra.items()})
            else:  # text encoder files merge under their own namespace
                sd.update(extra)

    g = guess_mod.guess(sd)

    text_encoders: Dict[str, Any] = {}
    for name, tsd in g.text_encoders.items():
        if name.startswith("open_clip"):
            tsd = convert_open_clip(tsd)
            name = {"open_clip_h": "clip_h", "open_clip_g": "clip_g"}[name]
        elif name.startswith("clip") and not any(k.startswith("text_model.") for k in tsd):
            # bare CLIP dumps → HF text_model namespace (T5 keys stay as-is)
            tsd = {f"text_model.{k}" if not k.startswith("text_projection") else k: v
                   for k, v in tsd.items()}
        text_encoders[name] = _to_device_tree(tsd, text_dtype)

    if g.unet and unet_quant:
        unet = _to_quantized_tree(g.unet, unet_quant, dtype)
    else:
        unet = _to_device_tree(g.unet, dtype) if g.unet else None
    vae = _to_device_tree(g.vae, vae_dtype) if g.vae else None

    return LoadedCheckpoint(g.family, g.prediction, g.context_dim, unet, vae, text_encoders)
