"""Upscalers: resize-mode algorithms + tiled GAN upscaling (ESRGAN-family).

Covers the reference's upscaler stack (modules/upscaler.py base + tiling,
upscaler_utils.py:51-214 tiled inference with seam blending, esrgan_model.py)
re-expressed for TPU: the ESRGAN (RRDBNet) forward is a pure JAX function in
NHWC; tiling is plain array slicing with Gaussian-feathered overlap blending;
Lanczos/Nearest run through PIL like the reference (:124-150).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import nn


# ---------------------------------------------------------------------------
# simple resizers


def upscale_pil(img: np.ndarray, scale: float, mode: str = "Lanczos") -> np.ndarray:
    from PIL import Image

    pil = Image.fromarray(np.asarray(img, np.uint8))
    w, h = int(pil.width * scale), int(pil.height * scale)
    resample = Image.LANCZOS if mode == "Lanczos" else Image.NEAREST
    return np.asarray(pil.resize((w, h), resample))


# ---------------------------------------------------------------------------
# RRDBNet (ESRGAN) — pure fn over checkpoint keys
# (keys: model.0 conv_first; body RRDB.{i}.RDB{j}.conv{k}; newer 'real-esrgan'
# naming: conv_first, body.N.rdb1.conv1, conv_body, conv_up1/2, conv_hr,
# conv_last)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    c1 = _lrelu(nn.conv2d(x, p["conv1"], padding=1))
    c2 = _lrelu(nn.conv2d(jnp.concatenate([x, c1], -1), p["conv2"], padding=1))
    c3 = _lrelu(nn.conv2d(jnp.concatenate([x, c1, c2], -1), p["conv3"], padding=1))
    c4 = _lrelu(nn.conv2d(jnp.concatenate([x, c1, c2, c3], -1), p["conv4"], padding=1))
    c5 = nn.conv2d(jnp.concatenate([x, c1, c2, c3, c4], -1), p["conv5"], padding=1)
    return x + 0.2 * c5


def _rrdb(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    out = _rdb(p["rdb1"], x)
    out = _rdb(p["rdb2"], out)
    out = _rdb(p["rdb3"], out)
    return x + 0.2 * out


def rrdbnet_apply(params: Mapping[str, Any], x: jax.Array, scale: int = 4) -> jax.Array:
    """x [B,H,W,3] in [0,1] → upscaled [B,sH,sW,3]."""
    feat = nn.conv2d(x, params["conv_first"], padding=1)
    body = feat
    blocks = params["body"]
    for i in range(len(blocks)):
        body = _rrdb(blocks[str(i)], body)
    feat = feat + nn.conv2d(body, params["conv_body"], padding=1)
    if scale >= 2:
        feat = _lrelu(nn.conv2d(nn.upsample_nearest_2x(feat), params["conv_up1"], padding=1))
    if scale >= 4:
        feat = _lrelu(nn.conv2d(nn.upsample_nearest_2x(feat), params["conv_up2"], padding=1))
    feat = _lrelu(nn.conv2d(feat, params["conv_hr"], padding=1))
    return nn.conv2d(feat, params["conv_last"], padding=1)


def convert_esrgan_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Old-ESRGAN 'model.N' serialization → RRDBNet names (behavioral
    equivalent of spandrel's detection the reference relies on)."""
    if "conv_first.weight" in sd:
        return dict(sd)
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if not k.startswith("model."):
            continue
        parts = k.split(".")
        idx = int(parts[1])
        if idx == 0:
            out["conv_first." + parts[-1]] = v
        elif idx == 1:  # model.1.sub.N...
            if parts[3] == "23" if len(parts) > 3 else False:
                pass
            if parts[2] == "sub":
                sub_idx = parts[3]
                if len(parts) == 6:  # model.1.sub.23.{weight,bias} → conv_body
                    out["conv_body." + parts[-1]] = v
                else:  # model.1.sub.N.RDBk.convj.0.{weight,bias}
                    rdb = parts[4].lower()
                    conv = parts[5].lower()
                    out[f"body.{sub_idx}.{rdb}.{conv}." + parts[-1]] = v
        elif idx == 3:
            out["conv_up1." + parts[-1]] = v
        elif idx == 6:
            out["conv_up2." + parts[-1]] = v
        elif idx == 8:
            out["conv_hr." + parts[-1]] = v
        elif idx == 10:
            out["conv_last." + parts[-1]] = v
    return out


# ---------------------------------------------------------------------------
# tiled inference with feathered seams (reference upscaler_utils.py:91-164)


def tiled_upscale(
    img: np.ndarray,
    fn: Callable[[jax.Array], jax.Array],
    scale: int,
    tile_size: int = 192,
    overlap: int = 8,
) -> np.ndarray:
    """img [H,W,3] float in [0,1] → [sH,sW,3]. `fn` maps [1,t,t,3]→[1,st,st,3]."""
    h, w, _ = img.shape
    if h <= tile_size and w <= tile_size:
        return np.asarray(fn(jnp.asarray(img[None]))[0])

    stride = tile_size - overlap
    out = np.zeros((h * scale, w * scale, 3), np.float32)
    weight = np.zeros((h * scale, w * scale, 1), np.float32)

    ramp = np.minimum(np.arange(1, tile_size * scale + 1), overlap * scale) / (overlap * scale)
    feather2d = np.minimum.outer(
        np.minimum(ramp, ramp[::-1]), np.minimum(ramp, ramp[::-1])
    )[..., None].astype(np.float32)

    for top in range(0, max(h - overlap, 1), stride):
        for left in range(0, max(w - overlap, 1), stride):
            bottom = min(top + tile_size, h)
            right = min(left + tile_size, w)
            t0, l0 = bottom - min(tile_size, h), right - min(tile_size, w)
            tile = img[t0:bottom, l0:right]
            up = np.asarray(fn(jnp.asarray(tile[None]))[0], np.float32)
            fh, fw = up.shape[0], up.shape[1]
            fmask = feather2d[:fh, :fw]
            out[t0 * scale : t0 * scale + fh, l0 * scale : l0 * scale + fw] += up * fmask
            weight[t0 * scale : t0 * scale + fh, l0 * scale : l0 * scale + fw] += fmask
    return out / np.maximum(weight, 1e-6)


# ---------------------------------------------------------------------------
# registry


class Upscaler:
    def __init__(self, name: str, fn: Callable[[np.ndarray, float], np.ndarray], scale: int = 4):
        self.name = name
        self.fn = fn
        self.scale = scale

    def upscale(self, img: np.ndarray, scale: float) -> np.ndarray:
        return self.fn(img, scale)


def _identity(img, scale):
    return img


class UpscalerRegistry:
    def __init__(self, model_dirs: Optional[Dict[str, str]] = None):
        self.model_dirs = model_dirs or {}
        self._gan_cache: Dict[str, Any] = {}
        self.upscalers: Dict[str, Upscaler] = {
            "None": Upscaler("None", _identity, 1),
            "Lanczos": Upscaler("Lanczos", lambda i, s: upscale_pil(i, s, "Lanczos"), 1),
            "Nearest": Upscaler("Nearest", lambda i, s: upscale_pil(i, s, "Nearest"), 1),
        }
        self.discover()

    def discover(self):
        import glob
        import os

        for kind, d in self.model_dirs.items():
            for path in sorted(glob.glob(os.path.join(d, "*.safetensors")) + glob.glob(os.path.join(d, "*.pth"))):
                name = os.path.splitext(os.path.basename(path))[0]
                self.upscalers[name] = Upscaler(
                    name, self._make_gan_fn(path, arch=kind), 4)

    def _load_model(self, path: str):
        """Sniff architecture from checkpoint keys (the spandrel-registry
        equivalent, modules/modelloader.py:load_spandrel_model): HAT
        (overlap_attn), SwinIR (residual_group), DAT (spatial_interaction +
        before_RG), SCUNet (m_head + Swin-Conv trans_block), RRDB/ESRGAN/
        RealESRGAN otherwise. → (apply_fn [1,t,t,3]→[1,st,st,3], scale)."""
        cached = self._gan_cache.get(path)
        if cached is not None:
            return cached
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        raw = load_state_dict(path)
        for wrap in ("params_ema", "params"):
            if wrap in raw and isinstance(raw[wrap], dict):
                raw = raw[wrap]
                break
        if any("overlap_attn" in k for k in raw):
            from ..models.hat import hat_apply, infer_hat_meta, load_hat

            params = load_hat(path)
            meta = infer_hat_meta(params)
            model_scale = meta["scale"]
            _jf = jax.jit(lambda p, t: hat_apply(p, t, **meta))
        elif any("residual_group" in k for k in raw):
            from ..models.swinir import infer_swinir_meta, load_swinir, swinir_apply

            params = load_swinir(path)
            meta = infer_swinir_meta(params)
            model_scale = meta["scale"]
            _jf = jax.jit(lambda p, t: swinir_apply(
                p, t, window_size=meta["window_size"],
                heads=meta["heads"], scale=model_scale))
        elif any("spatial_interaction" in k for k in raw) and any(
                k.startswith("before_RG") for k in raw):
            from ..models.dat import dat_apply, infer_dat_meta, load_dat

            params = load_dat(path)
            meta = infer_dat_meta(params)
            model_scale = meta["scale"]
            _jf = jax.jit(lambda p, t: dat_apply(p, t, heads=meta["heads"],
                                                 scale=model_scale))
        elif any("trans_block.msa" in k for k in raw):
            from ..models.scunet import infer_scunet_meta, load_scunet, scunet_apply

            params = load_scunet(path)
            meta = infer_scunet_meta(params)
            model_scale = 1  # SCUNet denoises at native resolution
            _jf = jax.jit(lambda p, t: scunet_apply(p, t, **meta))
        else:
            from ..core.state_dict import as_device_tree

            sd = convert_esrgan_keys(raw)
            params = as_device_tree(nest(transform_for_jax(sd)))
            model_scale = 4
            _jf = jax.jit(lambda p, t: rrdbnet_apply(p, t, model_scale))
        import functools

        apply_fn = functools.partial(_jf, params)
        self._gan_cache[path] = (apply_fn, model_scale)
        return self._gan_cache[path]

    def _make_gan_fn(self, path: str, arch: str = "ESRGAN"):
        def fn(img: np.ndarray, scale: float) -> np.ndarray:
            apply_fn, model_scale = self._load_model(path)
            x = np.asarray(img, np.float32)
            if x.max() > 1.5:
                x = x / 255.0

            from ..runtime.options import opts

            # per-architecture tile options (reference SWIN_tile/DAT_tile/
            # ESRGAN_tile + overlaps); unknown arch falls back to ESRGAN's
            key = {"SwinIR": "SWIN", "DAT": "DAT"}.get(arch, "ESRGAN")
            try:
                tile = int(opts.get(f"{key}_tile"))
                ov = int(opts.get(f"{key}_tile_overlap"))
            except KeyError:
                try:
                    tile = int(opts.get("ESRGAN_tile"))
                    ov = int(opts.get("ESRGAN_tile_overlap"))
                except KeyError:
                    tile, ov = 192, 8
            out = tiled_upscale(x, apply_fn, model_scale,
                                tile_size=tile or 192, overlap=max(ov, 1))
            out = np.clip(out, 0, 1)
            if abs(scale - model_scale) > 1e-6:
                out = upscale_pil((out * 255).astype(np.uint8), scale / model_scale) / 255.0
            return (out * 255).astype(np.uint8)

        return fn

    def get(self, name: str) -> Upscaler:
        if name in self.upscalers:
            return self.upscalers[name]
        low = (name or "").lower()
        for key, u in self.upscalers.items():
            if key.lower() == low:
                return u
        raise KeyError(f"unknown upscaler {name!r} — available: "
                       + ", ".join(sorted(self.upscalers)))


_DEFAULT_REGISTRY = None


def get_default_registry() -> "UpscalerRegistry":
    """Process-wide registry over the standard models/ dirs — one discovery,
    shared by the API, hires-fix, and the SD-upscale script (each used to
    build its own empty registry and silently fall back to Lanczos)."""
    global _DEFAULT_REGISTRY
    if _DEFAULT_REGISTRY is None:
        _DEFAULT_REGISTRY = UpscalerRegistry(model_dirs={
            "ESRGAN": "models/ESRGAN", "RealESRGAN": "models/RealESRGAN",
            "SwinIR": "models/SwinIR", "DAT": "models/DAT", "HAT": "models/HAT",
        })
    return _DEFAULT_REGISTRY
