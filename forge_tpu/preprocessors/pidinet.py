"""PiDiNet soft-edge annotator (softedge_pidinet / pidisafe) in JAX.

Re-expression of the reference's PiDiNet (extensions-builtin/
forge_legacy_preprocessors/annotator/pidinet/model.py:468, config 'carv4',
inplane 60, CDCM dil 24 + CSAM attention). The pixel-difference convolutions
(cd/ad/rd) are algebraic rewrites of plain convolutions — the reference's own
PDCBlock_converted (model.py:438) documents the equivalence — so the weights
are converted ONCE at load (cd: subtract the kernel sum at the center tap;
ad: subtract the clockwise-rotated kernel; rd: embed the 8 outer taps into a
5×5 ring with negated inner ring) and the forward pass is a vanilla convnet:
16 depthwise-separable residual blocks in 4 stages → per-stage CDCM dilation
fan-in → CSAM spatial attention → 1-channel maps fused by a 1×1 classifier.

Checkpoint: models/pidinet/table5_pidinet.pth.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

# carv4: pdc op per layer index (init_block is layer 0)
_CARV4 = ["cd", "ad", "rd", "cv"] * 4


def _convert_pdc(w: np.ndarray, op: str) -> np.ndarray:
    """OIHW [C,1,3,3] pdc kernel → plain conv kernel (3×3, or 5×5 for rd)."""
    w = np.asarray(w, np.float32)
    if op == "cv":
        return w
    if op == "cd":
        out = w.copy()
        out[:, :, 1, 1] -= w.sum(axis=(2, 3))
        return out
    if op == "ad":
        flat = w.reshape(w.shape[0], w.shape[1], 9)
        rot = flat[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]  # clockwise
        return (flat - rot).reshape(w.shape)
    if op == "rd":
        flat = w.reshape(w.shape[0], w.shape[1], 9)
        buf = np.zeros((w.shape[0], w.shape[1], 25), np.float32)
        buf[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = flat[:, :, 1:]
        buf[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -flat[:, :, 1:]
        return buf.reshape(w.shape[0], w.shape[1], 5, 5)
    raise ValueError(op)


def convert_pidinet_sd(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Apply the pdc→vanilla weight conversion to a raw checkpoint (OIHW)."""
    out = dict(sd)
    out["init_block.weight"] = _convert_pdc(sd["init_block.weight"], _CARV4[0])
    for s in range(1, 5):
        for j in range(1, 4 + (s > 1)):
            idx = [0, 1, 4, 8, 12][s] + (j - 1)
            key = f"block{s}_{j}.conv1.weight"
            out[key] = _convert_pdc(sd[key], _CARV4[idx])
    return out


def _block(p: Mapping[str, Any], x: jax.Array, stride: int) -> jax.Array:
    if stride > 1:
        x = -jax.lax.reduce_window(-x, np.inf, jax.lax.min,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    c = x.shape[-1]
    k = p["conv1"]["weight"].shape[0]
    y = nn.conv2d(x, p["conv1"], padding=k // 2, feature_group_count=c)
    y = nn.conv2d(jax.nn.relu(y), p["conv2"])
    if "shortcut" in p:
        x = nn.conv2d(x, p["shortcut"])
    return y + x


def _cdcm(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    x = nn.conv2d(jax.nn.relu(x), p["conv1"])
    acc = None
    for name, dil in (("conv2_1", 5), ("conv2_2", 7), ("conv2_3", 9), ("conv2_4", 11)):
        w = p[name]["weight"].astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(dil, dil), (dil, dil)],
            rhs_dilation=(dil, dil), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        acc = y if acc is None else acc + y
    return acc


def _csam(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    y = nn.conv2d(jax.nn.relu(x), p["conv1"])
    y = jax.nn.sigmoid(nn.conv2d(y, p["conv2"], padding=1))
    return x * y


def pidinet_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,3] BGR in [0,1] → fused edge map [B,H,W,1] in (0,1)."""
    h, w = x.shape[1:3]
    init_k = params["init_block"]["weight"].shape[0]
    z = nn.conv2d(x, params["init_block"], padding=init_k // 2)
    stages = []
    for s in range(1, 5):
        for j in range(1, 4 + (s > 1)):
            z = _block(params[f"block{s}_{j}"], z, stride=2 if (s > 1 and j == 1) else 1)
        stages.append(z)
    maps = []
    for i, xi in enumerate(stages):
        f = _csam(params["attentions"][str(i)], _cdcm(params["dilations"][str(i)], xi))
        e = nn.conv2d(f, params["conv_reduces"][str(i)]["conv"])
        maps.append(jax.image.resize(e, (e.shape[0], h, w, 1), "bilinear"))
    fused = nn.conv2d(jnp.concatenate(maps, axis=-1), params["classifier"])
    return jax.nn.sigmoid(fused)


class PidiDetector:
    def __init__(self, model_dir: str = "models/pidinet"):
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
        path = os.path.join(self.model_dir, "table5_pidinet.pth")
        if not os.path.exists(path):
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = {k.replace("module.", ""): v
              for k, v in load_state_dict(path).items()}
        sd = convert_pidinet_sd(sd)
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})

    def detect(self, img: np.ndarray, is_safe: bool = False,
               apply_filter: bool = False) -> np.ndarray:
        """uint8 RGB [H,W,3] → edge uint8 [H,W] (reference apply_pidinet)."""
        self.load()
        if self.params is None:
            raise RuntimeError(f"no table5_pidinet.pth under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(pidinet_apply)
        bgr = img[:, :, ::-1].astype(np.float32) / 255.0
        edge = np.asarray(self._jit(self.params, jnp.asarray(bgr[None])))[0, :, :, 0]
        if apply_filter:
            edge = (edge > 0.5).astype(np.float32)
        if is_safe:
            from .hed import _safe_step

            edge = _safe_step(edge)
        return (edge * 255.0).clip(0, 255).astype(np.uint8)


_DETECTOR: Optional[PidiDetector] = None


def get_pidinet() -> PidiDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = PidiDetector()
    return _DETECTOR


def _softedge(img, res, a, b):
    from .cv import resize_image

    e = get_pidinet().detect(resize_image(img, res))
    return np.repeat(e[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _softedge_safe(img, res, a, b):
    from .cv import resize_image

    e = get_pidinet().detect(resize_image(img, res), is_safe=True)
    return np.repeat(e[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _scribble(img, res, a, b):
    from .cv import resize_image

    e = get_pidinet().detect(resize_image(img, res), apply_filter=True)
    return np.repeat(e[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _register():
    from . import Preprocessor, register

    register(Preprocessor("softedge_pidinet", _softedge, tags=("SoftEdge",),
                          needs_weights=True), aliases=("pidinet",))
    register(Preprocessor("softedge_pidisafe", _softedge_safe,
                          tags=("SoftEdge",), needs_weights=True))
    register(Preprocessor("scribble_pidinet", _scribble, tags=("Scribble",),
                          needs_weights=True))


_register()
