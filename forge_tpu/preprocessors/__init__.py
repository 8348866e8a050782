"""ControlNet preprocessor (annotator) registry.

Behavioral twin of the reference's Preprocessor objects + registry
(modules_forge/supported_preprocessor.py:20-74, modules_forge/shared.py:40-66).
Pure-CV annotators (canny, lineart-standard, scribble-XDoG, shuffle, blur,
tile, threshold, invert) are numpy implementations; model-based annotators
(depth MiDaS, openpose) live in their own modules and register on import.

Contract: __call__(img_uint8 [H,W,3], res:int, threshold_a, threshold_b)
→ float32 map [H,W,3] in [0,1] at the detect resolution (the caller resizes
back to generation size).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import numpy as np

from .cv import (
    canny,
    gaussian_blur,
    lineart_standard,
    resize_image,
    scribble_xdog,
    shuffle_map,
    threshold_map,
)


@dataclasses.dataclass
class Preprocessor:
    name: str
    call: Callable  # (img u8 [H,W,3], res, a, b) -> f32 [h,w,3] in [0,1]
    slider_a: Optional[tuple] = None  # (label, min, max, default)
    slider_b: Optional[tuple] = None
    resolution_default: int = 512
    tags: tuple = ()
    # model-based annotators register unconditionally (the reference lists
    # every annotator and fetches weights on first use); calling one without
    # its checkpoint raises a RuntimeError naming the expected directory
    needs_weights: bool = False

    def __call__(self, img: np.ndarray, res: int = 512,
                 threshold_a: float = 0.0, threshold_b: float = 0.0) -> np.ndarray:
        return self.call(img, res, threshold_a, threshold_b)


PREPROCESSORS: Dict[str, Preprocessor] = {}


def register(p: Preprocessor, aliases=()) -> Preprocessor:
    PREPROCESSORS[p.name] = p
    for a in aliases:
        PREPROCESSORS[a] = p
    return p


def get_preprocessor(name: str) -> Preprocessor:
    if name in PREPROCESSORS:
        return PREPROCESSORS[name]
    low = name.lower().replace(" ", "_")
    for key, p in PREPROCESSORS.items():
        if key.lower().replace(" ", "_") == low:
            return p
    raise KeyError(f"unknown preprocessor {name!r}")


def preprocessor_names():
    seen, out = set(), []
    for name, p in PREPROCESSORS.items():
        if id(p) not in seen:
            seen.add(id(p))
            out.append(name)
    return out


def _to_float(img):
    return np.asarray(img, np.float32) / 255.0 if img.dtype == np.uint8 \
        else np.asarray(img, np.float32)


def _none(img, res, a, b):
    return _to_float(resize_image(img, res))


def _invert(img, res, a, b):
    return 1.0 - _to_float(resize_image(img, res))


def _canny(img, res, a, b):
    lo = int(a) if a else 100
    hi = int(b) if b else 200
    edges = canny(resize_image(img, res), lo, hi)
    return np.repeat(edges[..., None], 3, axis=2)


def _blur(img, res, a, b):
    sigma = float(a) if a else 9.0
    return gaussian_blur(_to_float(resize_image(img, res)), sigma)


def _shuffle(img, res, a, b):
    return shuffle_map(_to_float(resize_image(img, res)), seed=int(b) if b else 0)


def _lineart_std(img, res, a, b):
    g = lineart_standard(resize_image(img, res), float(a) if a else 6.0)
    return np.repeat(g[..., None], 3, axis=2)


def _xdog(img, res, a, b):
    g = scribble_xdog(resize_image(img, res), float(a) if a else 32.0)
    return np.repeat(g[..., None], 3, axis=2)


def _threshold(img, res, a, b):
    g = threshold_map(resize_image(img, res), float(a) if a else 127.0)
    return np.repeat(g[..., None], 3, axis=2)


def _recolor_luminance(img, res, a, b):
    """LAB L-channel re-color map (reference preprocessor.py:652 — which
    applies COLOR_BGR2LAB to the RGB array; reproduced for parity)."""
    import cv2

    g = float(a) if a else 1.0
    lab = cv2.cvtColor(resize_image(img, res), cv2.COLOR_BGR2LAB)
    out = np.power(lab[:, :, 0].astype(np.float32) / 255.0, g)
    return np.repeat(out[..., None], 3, axis=2)


def _recolor_intensity(img, res, a, b):
    import cv2

    g = float(a) if a else 1.0
    hsv = cv2.cvtColor(resize_image(img, res), cv2.COLOR_BGR2HSV)
    out = np.power(hsv[:, :, 2].astype(np.float32) / 255.0, g)
    return np.repeat(out[..., None], 3, axis=2)


def _color_grid(img, res, a, b):
    """T2I color-adapter palette grid: 64× down then nearest re-up
    (reference annotator/color/__init__.py apply_color)."""
    import cv2

    img = resize_image(img, res)
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(w // 64, 1), max(h // 64, 1)),
                       interpolation=cv2.INTER_CUBIC)
    out = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    return _to_float(out)


def _binary(img, res, a, b):
    """Inverted binary threshold; 0/255 → Otsu (reference annotator/binary)."""
    import cv2

    gray = cv2.cvtColor(resize_image(img, res), cv2.COLOR_RGB2GRAY)
    thr = int(a) if a else 0
    if thr in (0, 255):
        _, out = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)
    else:
        _, out = cv2.threshold(gray, thr, 255, cv2.THRESH_BINARY_INV)
    return np.repeat(out[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _tile_resample(img, res, a, b):
    down = max(float(a), 1.0) if a else 1.0
    h, w = img.shape[:2]
    small = resize_image(img, int(min(h, w) / down))
    return _to_float(resize_image(small, res))


register(Preprocessor("none", _none, tags=("All",)))
register(Preprocessor("invert", _invert, tags=("All",)),
         aliases=("invert (from white bg & black line)",))
register(Preprocessor(
    "canny", _canny,
    slider_a=("Low Threshold", 0, 255, 100),
    slider_b=("High Threshold", 0, 255, 200), tags=("Canny",)))
register(Preprocessor(
    "blur_gaussian", _blur, slider_a=("Sigma", 0.01, 64.0, 9.0), tags=("Tile",)))
register(Preprocessor("shuffle", _shuffle, tags=("Shuffle",)))
register(Preprocessor(
    "lineart_standard", _lineart_std,
    slider_a=("Guassian Sigma", 0.01, 16.0, 6.0), tags=("Lineart",)),
    aliases=("lineart_standard (from white bg & black line)",))
register(Preprocessor(
    "scribble_xdog", _xdog, slider_a=("XDoG Threshold", 1, 64, 32), tags=("Scribble",)))
register(Preprocessor(
    "threshold", _threshold, slider_a=("Binarization Threshold", 0, 255, 127),
    tags=("Scribble",)))
register(Preprocessor(
    "tile_resample", _tile_resample, slider_a=("Down Sampling Rate", 1.0, 8.0, 1.0),
    tags=("Tile",)))
register(Preprocessor(
    "recolor_luminance", _recolor_luminance,
    slider_a=("Gamma Correction", 0.1, 2.0, 1.0), tags=("Recolor",)))
register(Preprocessor(
    "recolor_intensity", _recolor_intensity,
    slider_a=("Gamma Correction", 0.1, 2.0, 1.0), tags=("Recolor",)))
register(Preprocessor("t2ia_color_grid", _color_grid, tags=("T2I-Adapter",)),
         aliases=("color",))
register(Preprocessor(
    "threshold_binary", _binary,
    slider_a=("Binary Threshold", 0, 255, 0), tags=("Scribble",)),
    aliases=("binary",))

# reference guidance (no control model; consumed by extensions/controlnet.py
# build_unit_state → pipeline/reference_only.py; call is identity — the unit
# image is used as-is, reference forge_reference.py slider_resolution hidden)
for _ref_name in ("reference_only", "reference_adain", "reference_adain+attn"):
    register(Preprocessor(
        _ref_name, _none,
        slider_a=("Style Fidelity", 0.0, 1.0, 0.5), tags=("Reference",)))

# Revision (SDXL pooled-cond substitution; consumed in extensions/controlnet.py
# — reference preprocessor_revision.py; the noise-aug slider is hidden there
# because SDXL has no noise augmentor, so it is omitted here entirely)
register(Preprocessor("CLIP-G (Revision)", _none, tags=("Revision",)),
         aliases=("revision_clipvision",))
register(Preprocessor("CLIP-G (Revision ignore prompt)", _none, tags=("Revision",)),
         aliases=("revision_ignore_prompt",))

# Inpaint preprocessors (hint mixing + latent composite happen in
# extensions/controlnet.py + pipeline/processing.py; the registry entries
# carry UI metadata — reference preprocessor_inpaint.py)
register(Preprocessor("inpaint_global_harmonious", _none, tags=("Inpaint",)),
         aliases=("inpaint",))
register(Preprocessor("inpaint_only", _none, tags=("Inpaint",)))
def _inpaint_lama(img, res, a=0.0, b=0.0):
    # the LaMa prefill itself runs in the pipeline latent composite; the
    # preprocessor entry validates the checkpoint is present so a missing
    # weights dir fails here, like every other model-based annotator
    from .lama import get_lama
    if not get_lama().available:
        raise RuntimeError(
            "inpaint_only+lama needs the LaMa generator checkpoint "
            "(ControlNetLama.pth) under models/lama")
    return _none(img, res, a, b)


register(Preprocessor("inpaint_only+lama", _inpaint_lama, tags=("Inpaint",),
                      needs_weights=True))

# model-based annotators self-register on import (kept lazy: weights optional)
try:  # noqa: SIM105
    from . import depth  # noqa: F401
except Exception:  # pragma: no cover — missing weights is fine at import
    pass
try:  # noqa: SIM105
    from . import openpose  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from . import hed  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from . import lineart  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from . import pidinet  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from . import mlsd  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from . import depth_anything  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from . import teed  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from . import manga_line  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from . import leres  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from . import dwpose  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from . import anime_face  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:
    from . import normalbae  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:
    from . import mediapipe_face  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:
    from . import uniformer  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:
    from . import zoe  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:
    from . import marigold  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:
    from . import densepose  # noqa: F401
except Exception:  # pragma: no cover
    pass
try:
    from . import oneformer  # noqa: F401
except Exception:  # pragma: no cover
    pass
