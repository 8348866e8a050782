"""HED soft-edge preprocessor (ControlNetHED, Apache-2 variant) in JAX.

Re-implementation of the annotator the reference ships
(extensions-builtin/forge_legacy_preprocessors/annotator/hed/__init__.py
ControlNetHED_Apache2): a VGG-style ladder of DoubleConvBlocks whose five
1-channel side projections are resized to input size, averaged, and squashed
through a sigmoid. Checkpoint keys: norm, block{1..5}.convs.{i}.weight/bias,
block{1..5}.projection.* (ControlNetHED.pth under models/hed).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

_LAYERS = {1: 2, 2: 2, 3: 3, 4: 3, 5: 3}


def hed_apply(params: Mapping[str, Any], x: jax.Array):
    """x [B,H,W,3] (raw 0..255 floats) → 5 side maps [B,h_i,w_i,1]."""
    h = x - jnp.asarray(params["norm"]).reshape(1, 1, 1, 3)
    outs = []
    for b in range(1, 6):
        blk = params[f"block{b}"]
        if b > 1:
            h = -jax.lax.reduce_window(-h, np.inf, jax.lax.min,
                                       (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        for i in range(_LAYERS[b]):
            h = jax.nn.relu(nn.conv2d(h, blk["convs"][str(i)], padding=1))
        outs.append(nn.conv2d(h, blk["projection"]))
    return outs


def _safe_step(x: np.ndarray, step: int = 2) -> np.ndarray:
    """annotator/util.py safe_step: quantize to `step` levels."""
    y = x.astype(np.float64) * float(step + 1)
    y = y.astype(np.int32).astype(np.float64) / float(step)
    return y


class HedDetector:
    def __init__(self, model_dir: str = "models/hed"):
        self.model_dir = model_dir
        self.params: Optional[Dict[str, Any]] = None
        self._jit = None

    @property
    def available(self) -> bool:
        try:
            self.load()
            return self.params is not None
        except Exception:
            return False

    def load(self):
        if self.params is not None:
            return
        if not os.path.isdir(self.model_dir):
            return
        cands = [f for f in sorted(os.listdir(self.model_dir))
                 if f.endswith((".pth", ".pt", ".safetensors"))]
        if not cands:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})
        self._jit = jax.jit(lambda t: hed_apply(self.params, t))

    def detect(self, img: np.ndarray, is_safe: bool = False) -> np.ndarray:
        """uint8 [H,W,3] → soft-edge uint8 [H,W] (reference apply_hed)."""
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no ControlNetHED checkpoint under {self.model_dir}")
        h, w = img.shape[:2]
        edges = self._jit(jnp.asarray(img[None].astype(np.float32)))
        maps = [cv2.resize(np.asarray(e[0, :, :, 0], np.float32), (w, h),
                           interpolation=cv2.INTER_LINEAR) for e in edges]
        edge = 1.0 / (1.0 + np.exp(-np.mean(np.stack(maps, 2), axis=2,
                                            dtype=np.float64)))
        if is_safe:
            edge = _safe_step(edge)
        return (edge * 255.0).clip(0, 255).astype(np.uint8)


_DETECTOR: Optional[HedDetector] = None


def get_hed() -> HedDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = HedDetector()
    return _DETECTOR


def _softedge_hed(img, res, a, b):
    from .cv import resize_image

    edge = get_hed().detect(resize_image(img, res))
    return np.repeat(edge[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _softedge_hedsafe(img, res, a, b):
    from .cv import resize_image

    edge = get_hed().detect(resize_image(img, res), is_safe=True)
    return np.repeat(edge[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _scribble_hed(img, res, a, b):
    """hed + gaussian + threshold (reference scribble_hed chain)."""
    from .cv import gaussian_blur, resize_image

    edge = get_hed().detect(resize_image(img, res)).astype(np.float32) / 255.0
    g = gaussian_blur(edge[..., None], 3.0)[..., 0]
    out = (g > 4.0 / 255.0).astype(np.float32)
    return np.repeat(out[..., None], 3, axis=2)


def _register():
    from . import Preprocessor, register

    register(Preprocessor("softedge_hed", _softedge_hed, tags=("SoftEdge",),
                          needs_weights=True), aliases=("hed",))
    register(Preprocessor("softedge_hedsafe", _softedge_hedsafe,
                          tags=("SoftEdge",), needs_weights=True))
    register(Preprocessor("scribble_hed", _scribble_hed, tags=("Scribble",),
                          needs_weights=True))


_register()
