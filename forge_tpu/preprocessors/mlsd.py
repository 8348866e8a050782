"""M-LSD line-segment annotator in JAX.

Re-expression of the reference's MobileV2_MLSD_Large + pred_lines
(extensions-builtin/forge_legacy_preprocessors/annotator/mlsd/models/
mbv2_mlsd_large.py:247, utils.py:48): a truncated MobileNetV2 backbone
(4-channel input: RGB + ones plane, TFLite-style asymmetric stride-2
padding) feeding an FPN of 1×1-fuse + residual 3×3 blocks, a dilated head
producing a 16-channel map whose channels 7:16 carry the line center heat +
start/end displacement field; line decoding (sigmoid → 3×3 NMS → top-k →
displacement endpoints) runs in numpy.

Checkpoint: models/mlsd/mlsd_large_512_fp32.pth.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

_BN_EPS = 1e-5


def _bn(x: jax.Array, p: Mapping[str, Any]) -> jax.Array:
    """BatchNorm2d in eval mode with running stats."""
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + _BN_EPS)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def _conv_bn_relu6(x, p, stride=1, groups=1):
    """ConvBNReLU (mbv2_mlsd_large.py:92): TFLite pads (0,1,0,1) at stride 2."""
    w = p["0"]["weight"]
    k = w.shape[0]
    if stride == 2:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        pad = 0
    else:
        pad = (k - 1) // 2
    x = nn.conv2d(x, p["0"], stride=stride, padding=pad, feature_group_count=groups)
    return jnp.clip(_bn(x, p["1"]), 0.0, 6.0)


def _inverted_residual(x, p, stride, expand):
    h = x
    seq = p["conv"]
    i = 0
    if expand:
        h = _conv_bn_relu6(h, seq["0"])
        i = 1
    dw_groups = seq[str(i)]["0"]["weight"].shape[-1]
    h = _conv_bn_relu6(h, seq[str(i)], stride=stride, groups=dw_groups)
    h = _bn(nn.conv2d(h, seq[str(i + 1)]), seq[str(i + 2)])
    if stride == 1 and x.shape[-1] == h.shape[-1]:
        h = h + x
    return h


# MobileNetV2 truncated config: (expand_ratio, n_repeats, first_stride)
_MBV2 = [(1, 1, 1), (6, 2, 2), (6, 3, 2), (6, 4, 2), (6, 3, 1)]
_FPN_SELECTED = (1, 3, 6, 10, 13)


def _upsample2_align(x: jax.Array) -> jax.Array:
    """2× bilinear with align_corners=True (torch F.interpolate semantics —
    jax.image.resize is half-pixel, so the gather is explicit)."""
    def axis(n_in, n_out):
        pos = jnp.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        f = (pos - i0).astype(jnp.float32)
        return i0, f

    b, h, w, c = x.shape
    i0, fy = axis(h, 2 * h)
    rows = x[:, i0] * (1 - fy)[None, :, None, None] + x[:, i0 + 1] * fy[None, :, None, None]
    j0, fx = axis(w, 2 * w)
    return rows[:, :, j0] * (1 - fx)[None, None, :, None] \
        + rows[:, :, j0 + 1] * fx[None, None, :, None]


def _block_a(pa, a, b, upscale=True):
    b = jax.nn.relu(_bn(nn.conv2d(b, pa["conv1"]["0"]), pa["conv1"]["1"]))
    a = jax.nn.relu(_bn(nn.conv2d(a, pa["conv2"]["0"]), pa["conv2"]["1"]))
    if upscale:
        b = _upsample2_align(b)
    return jnp.concatenate([a, b], axis=-1)


def _block_b(pb, x):
    h = jax.nn.relu(_bn(nn.conv2d(x, pb["conv1"]["0"], padding=1), pb["conv1"]["1"]))
    x = h + x
    return jax.nn.relu(_bn(nn.conv2d(x, pb["conv2"]["0"], padding=1), pb["conv2"]["1"]))


def _block_c(pc, x):
    w = pc["conv1"]["0"]["weight"].astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(5, 5), (5, 5)],
        rhs_dilation=(5, 5), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = h + pc["conv1"]["0"]["bias"].astype(h.dtype)
    h = jax.nn.relu(_bn(h, pc["conv1"]["1"]))
    h = jax.nn.relu(_bn(nn.conv2d(h, pc["conv2"]["0"], padding=1), pc["conv2"]["1"]))
    return nn.conv2d(h, pc["conv3"])


def mlsd_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [1,H,W,4] in [-1,1] (RGB + ones/127.5−1 plane) → [1,H/2,W/2,9]."""
    feats = params["backbone"]["features"]
    h = _conv_bn_relu6(x, feats["0"], stride=2)
    fpn = []
    idx = 1
    for t, n, s in _MBV2:
        for i in range(n):
            h = _inverted_residual(h, feats[str(idx)], s if i == 0 else 1, t != 1)
            if idx in _FPN_SELECTED:
                fpn.append(h)
            idx += 1
    c1, c2, c3, c4, c5 = fpn
    h = _block_b(params["block16"], _block_a(params["block15"], c4, c5, upscale=False))
    h = _block_b(params["block18"], _block_a(params["block17"], c3, h))
    h = _block_b(params["block20"], _block_a(params["block19"], c2, h))
    h = _block_b(params["block22"], _block_a(params["block21"], c1, h))
    out = _block_c(params["block23"], h)
    return out[:, :, :, 7:]


def decode_lines(tp_map: np.ndarray, topk: int = 200, ksize: int = 3,
                 score_thr: float = 0.10, dist_thr: float = 20.0) -> np.ndarray:
    """[h,w,9] head output → [N,4] line segments in map coordinates
    (reference utils.py:20 deccode_output_score_and_ptss + :48 pred_lines)."""
    from scipy.ndimage import maximum_filter

    center = tp_map[:, :, 0]
    displacement = tp_map[:, :, 1:5]
    heat = 1.0 / (1.0 + np.exp(-center))
    keep = maximum_filter(heat, size=ksize, mode="constant") == heat
    heat = heat * keep
    flat = heat.reshape(-1)
    idx = np.argsort(-flat)[:topk]
    scores = flat[idx]
    yy, xx = np.unravel_index(idx, heat.shape)
    start = displacement[:, :, :2]
    end = displacement[:, :, 2:]
    dist_map = np.sqrt(np.sum((start - end) ** 2, axis=-1))
    segments = []
    for y, x, score in zip(yy, xx, scores):
        if score > score_thr and dist_map[y, x] > dist_thr:
            dx0, dy0, dx1, dy1 = displacement[y, x]
            segments.append([x + dx0, y + dy0, x + dx1, y + dy1])
    return np.asarray(segments, np.float32).reshape(-1, 4)


class MlsdDetector:
    def __init__(self, model_dir: str = "models/mlsd"):
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
        if self.params is not None or not os.path.isdir(self.model_dir):
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

    def detect(self, img: np.ndarray, thr_v: float = 0.1,
               thr_d: float = 0.1) -> np.ndarray:
        """uint8 [H,W,3] → line drawing uint8 [H,W] (reference apply_mlsd)."""
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no mlsd checkpoint under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(mlsd_apply)
        h, w = img.shape[:2]
        size = 512
        resized = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
        feed = np.concatenate([resized, np.ones((size, size, 1))], axis=-1)
        feed = feed.astype(np.float32) / 127.5 - 1.0
        tp = np.asarray(self._jit(self.params, jnp.asarray(feed[None])))[0]
        lines = decode_lines(tp, 200, 3, float(thr_v or 0.1), float(thr_d or 0.1))
        out = np.zeros((h, w), np.uint8)
        for x0, y0, x1, y1 in 2 * lines:  # 256 → 512 map scale
            cv2.line(out, (int(x0 * w / size), int(y0 * h / size)),
                     (int(x1 * w / size), int(y1 * h / size)), 255, 1)
        return out


_DETECTOR: Optional[MlsdDetector] = None


def get_mlsd() -> MlsdDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = MlsdDetector()
    return _DETECTOR


def _mlsd(img, res, a, b):
    from .cv import resize_image

    m = get_mlsd().detect(resize_image(img, res), thr_v=a or 0.1, thr_d=b or 0.1)
    return np.repeat(m[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _register():
    from . import Preprocessor, register

    register(Preprocessor(
        "mlsd", _mlsd,
        slider_a=("Value Threshold", 0.01, 2.0, 0.1),
        slider_b=("Distance Threshold", 0.01, 20.0, 0.1),
        tags=("MLSD",), needs_weights=True))


_register()
