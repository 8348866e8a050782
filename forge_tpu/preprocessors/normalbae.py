"""NormalBAE surface-normal annotator in JAX.

Re-expression of the reference's NNET (extensions-builtin/
forge_preprocessor_normalbae/annotator/normalbae/models/NNET.py): a
tf_efficientnet_b5_ap encoder (geffnet; TF "SAME" asymmetric padding,
swish, squeeze-excite) whose block features [4],[5],[6],[8],[11] feed a
BN decoder (submodules/decoder.py:7) — conv2 1×1 on the conv_head output,
four UpSampleBN skip stages, a 3×3 1/8-res head, then three pixel-MLP
(1×1 conv) refinement stages that each bilinearly (align_corners=True)
upsample the previous prediction and re-estimate [nx,ny,nz,kappa], with
norm_normalize (submodules.py:66) after every head. Inference path only —
the uncertainty-guided point sampling is a training-time construct.

Every channel count, kernel size, expansion and block type is derived from
the checkpoint (scannet.pt, ckpt['model'] with 'module.' stripped), so any
EfficientNet-backbone NNET loads. Output mapping follows the wrapper script
(scripts/preprocessor_normalbae.py:68): rgb = (n + 1)/2 on the first three
channels of the full-res head.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from .depth_anything import _resize_align

_BN_EPS = 1e-3  # geffnet BN_EPS_TF_DEFAULT for tf_ ports
_STAGE_STRIDES = (1, 2, 2, 2, 1, 2, 1)  # EfficientNet stage plan (all of B0-B7)


def _bn(x, p, eps=_BN_EPS):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def _conv_same(x, p, stride=1, groups=1):
    """TF "SAME" conv: asymmetric (left-light) padding computed from the
    static input size, as geffnet's Conv2dSame does dynamically."""
    w = p["weight"]
    kh, kw = w.shape[0], w.shape[1]

    def pad(i, k):
        total = max((math.ceil(i / stride) - 1) * stride + k - i, 0)
        return (total // 2, total - total // 2)

    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[pad(x.shape[1], kh), pad(x.shape[2], kw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _se(p, x):
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = jax.nn.silu(_conv_same(s, p["conv_reduce"]))
    return x * jax.nn.sigmoid(_conv_same(s, p["conv_expand"]))


def _eff_block(p: Mapping[str, Any], x: jax.Array, stride: int) -> jax.Array:
    cin = x.shape[-1]
    if "conv_pwl" in p:  # InvertedResidual: pw-expand, dw, se, pw-linear
        h = jax.nn.silu(_bn(_conv_same(x, p["conv_pw"]), p["bn1"]))
        h = jax.nn.silu(_bn(_conv_same(h, p["conv_dw"], stride=stride,
                                       groups=h.shape[-1]), p["bn2"]))
        h = _se(p["se"], h)
        h = _bn(_conv_same(h, p["conv_pwl"]), p["bn3"])
    else:  # DepthwiseSeparable (stage 0)
        h = jax.nn.silu(_bn(_conv_same(x, p["conv_dw"], stride=stride,
                                       groups=cin), p["bn1"]))
        h = _se(p["se"], h)
        h = _bn(_conv_same(h, p["conv_pw"]), p["bn2"])
    if stride == 1 and cin == h.shape[-1]:
        h = h + x
    return h


def _norm_normalize(out: jax.Array) -> jax.Array:
    """L2-normalize (nx,ny,nz); kappa = elu(k)+1.01 (submodules.py:66)."""
    n, kappa = out[..., :3], out[..., 3:]
    norm = jnp.sqrt(jnp.sum(jnp.square(n), axis=-1, keepdims=True)) + 1e-10
    return jnp.concatenate([n / norm, jax.nn.elu(kappa) + 1.01], axis=-1)


def _upsample_bn(p, x, skip):
    x = _resize_align(x, skip.shape[1:3])
    h = jnp.concatenate([x, skip], axis=-1)
    h = jax.nn.leaky_relu(_bn(nn.conv2d(h, p["0"], padding=1), p["1"]), 0.01)
    return jax.nn.leaky_relu(_bn(nn.conv2d(h, p["3"], padding=1), p["4"]), 0.01)


def _pixel_mlp(p, feat, prev):
    """Conv1d(k=1) refinement head over a 2× upsampled feature/pred pair."""
    h2, w2 = feat.shape[1] * 2, feat.shape[2] * 2
    h = jnp.concatenate([_resize_align(feat, (h2, w2)),
                         _resize_align(prev, (h2, w2))], axis=-1)
    n = len(p)
    for i in range(0, 2 * n - 1, 2):  # stored indices 0,2,4,6 of the Sequential
        w = p[str(i)]["weight"]  # [O, I, 1] conv1d kernel
        h = jnp.einsum("bhwi,oi->bhwo", h, w[..., 0].astype(h.dtype)) \
            + p[str(i)]["bias"].astype(h.dtype)
        if i < 2 * (n - 1):
            h = jax.nn.relu(h)
    return _norm_normalize(h)


def normalbae_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,3] ImageNet-normalized → [B,H,W,4] (unit normal + kappa)."""
    enc = params["encoder"]["original_model"]
    h = jax.nn.silu(_bn(_conv_same(x, enc["conv_stem"], stride=2), enc["bn1"]))
    stage_outs = []
    for b in range(len(enc["blocks"])):
        stage = enc["blocks"][str(b)]
        for i in range(len(stage)):
            h = _eff_block(stage[str(i)], h,
                           _STAGE_STRIDES[b] if i == 0 else 1)
        stage_outs.append(h)
    xb0, xb1, xb2, xb3 = stage_outs[0], stage_outs[1], stage_outs[2], stage_outs[4]
    xb4 = _conv_same(stage_outs[-1], enc["conv_head"])  # features[11]: pre-bn2

    dec = params["decoder"]
    x_d0 = nn.conv2d(xb4, dec["conv2"])
    x_d1 = _upsample_bn(dec["up1"]["_net"], x_d0, xb3)
    x_d2 = _upsample_bn(dec["up2"]["_net"], x_d1, xb2)
    x_d3 = _upsample_bn(dec["up3"]["_net"], x_d2, xb1)
    x_d4 = _upsample_bn(dec["up4"]["_net"], x_d3, xb0)

    out = _norm_normalize(nn.conv2d(x_d2, dec["out_conv_res8"], padding=1))
    out = _pixel_mlp(dec["out_conv_res4"], x_d2, out)
    out = _pixel_mlp(dec["out_conv_res2"], x_d3, out)
    return _pixel_mlp(dec["out_conv_res1"], x_d4, out)


class NormalBaeDetector:
    def __init__(self, model_dir: str = "models/normalbae"):
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
                 if f.endswith((".pt", ".pth", ".safetensors"))]
        if not cands:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        if "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
        sd = {k.replace("module.", ""): v for k, v in sd.items()
              if not k.startswith("n_")}  # drop optimizer-ish scalars
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})

    def detect(self, img: np.ndarray) -> np.ndarray:
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no scannet.pt under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(normalbae_apply)
        h, w = img.shape[:2]
        nh, nw = ((h + 31) // 32) * 32, ((w + 31) // 32) * 32
        feed = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
        feed = (feed.astype(np.float32) / 255.0
                - np.asarray([0.485, 0.456, 0.406], np.float32)) \
            / np.asarray([0.229, 0.224, 0.225], np.float32)
        out = np.asarray(self._jit(self.params, jnp.asarray(feed[None])))[0]
        rgb = ((out[..., :3] + 1.0) * 0.5).clip(0, 1)
        return cv2.resize((rgb * 255.0).astype(np.uint8), (w, h),
                          interpolation=cv2.INTER_LINEAR)


_DETECTOR: Optional[NormalBaeDetector] = None


def get_normalbae() -> NormalBaeDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = NormalBaeDetector()
    return _DETECTOR


def _normalbae(img, res, a, b):
    from .cv import resize_image

    return np.asarray(get_normalbae().detect(resize_image(img, res)),
                      np.float32) / 255.0


def _register():
    from . import Preprocessor, register

    register(Preprocessor("normalbae", _normalbae, tags=("NormalMap",),
                          needs_weights=True),
             aliases=("normal_bae",))


_register()
