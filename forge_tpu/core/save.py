"""Checkpoint export: param trees → torch-format safetensors.

Covers the reference's save_unet/save_checkpoint requant-preserving export
(backend/diffusion_engine/base.py:70-87, backend/utils.py:150-163): nested
JAX trees flatten back to dotted keys, HWIO conv kernels transpose back to
torch OIHW, quantized leaves dequantize to the requested dtype.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..ops import quant
from .tree import iter_leaves


def tree_to_state_dict(tree: Mapping[str, Any], prefix: str = "", dtype=np.float16) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for path, leaf in iter_leaves(tree):
        key = f"{prefix}{path}"
        if quant.is_quantized(leaf):
            arr = np.asarray(quant.dequantize(leaf, dtype=np.float32))
        else:
            arr = np.asarray(leaf, dtype=np.float32)
        if arr.ndim == 4:  # HWIO → OIHW
            arr = np.transpose(arr, (3, 2, 0, 1))
        out[key] = arr.astype(dtype) if arr.dtype.kind == "f" else arr
    return out


def save_safetensors(sd: Mapping[str, np.ndarray], path: str, metadata=None):
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path,
              metadata=metadata or {"format": "pt"})


def save_checkpoint(engine, path: str, dtype=np.float16):
    """Export a full merged checkpoint (unet + vae + text encoders) in the
    reference's single-file key layout for the engine's family."""
    sd: Dict[str, np.ndarray] = {}
    sd.update(tree_to_state_dict(engine.loaded.unet, "model.diffusion_model.", dtype))
    if engine.loaded.vae is not None:
        sd.update(tree_to_state_dict(engine.loaded.vae, "first_stage_model.", dtype))
    te_prefixes = {
        "sd15": {"clip_l": "cond_stage_model.transformer."},
        "sd20": {"clip_h": "cond_stage_model.model."},
        "sdxl": {"clip_l": "conditioner.embedders.0.transformer.",
                 "clip_g": "conditioner.embedders.1.model."},
        "flux": {"clip_l": "text_encoders.clip_l.transformer.",
                 "t5xxl": "text_encoders.t5xxl.transformer."},
        "sd3": {"clip_l": "text_encoders.clip_l.transformer.",
                "clip_g": "text_encoders.clip_g.transformer.",
                "t5xxl": "text_encoders.t5xxl.transformer."},
    }.get(engine.family, {})
    for name, params in engine.loaded.text_encoders.items():
        prefix = te_prefixes.get(name, f"text_encoders.{name}.transformer.")
        sd.update(tree_to_state_dict(params, prefix, dtype))
    save_safetensors(sd, path)
    return path
