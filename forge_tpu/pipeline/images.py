"""Image IO: save with embedded generation parameters, filename patterns,
grids; infotext parsing back into parameters.

Covers the reference's modules/images.py save path (PNG tEXt / JPEG EXIF
metadata, :568-626), FilenameGenerator tokens (:384, subset), grid assembly
(:22-100), and modules/infotext_utils.py:251 parse_generation_parameters."""

from __future__ import annotations

import datetime
import math
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from PIL import Image, PngImagePlugin


def to_pil(arr: np.ndarray) -> Image.Image:
    return Image.fromarray(np.asarray(arr, dtype=np.uint8))


def save_image(
    image,
    path: Optional[str] = None,
    outdir: str = "outputs",
    infotext: Optional[str] = None,
    file_format: str = "png",
    filename_pattern: str = "[seed]-[prompt_spaces]",
    seed: int = 0,
    prompt: str = "",
    quality: int = 95,
) -> str:
    img = image if isinstance(image, Image.Image) else to_pil(image)
    if path is None:
        os.makedirs(outdir, exist_ok=True)
        name = apply_filename_pattern(filename_pattern, seed=seed, prompt=prompt)
        base = os.path.join(outdir, name)
        path = f"{base}.{file_format}"
        i = 1
        while os.path.exists(path):
            path = f"{base}-{i}.{file_format}"
            i += 1

    from ..runtime.scripts import fire

    fire("before_image_saved", path, img, infotext)

    if file_format.lower() == "png":
        pnginfo = PngImagePlugin.PngInfo()
        if infotext:
            pnginfo.add_text("parameters", infotext)
        img.save(path, format="PNG", pnginfo=pnginfo)
    elif file_format.lower() in ("jpg", "jpeg", "webp"):
        img.save(path, quality=quality)
        if infotext:
            _save_exif_comment(path, infotext)
    else:
        img.save(path)
    fire("image_saved", path, img, infotext)
    return path


def _save_exif_comment(path: str, text: str):
    try:
        import piexif

        exif = piexif.dump({"Exif": {piexif.ExifIFD.UserComment: b"UNICODE\0" + text.encode("utf-16-be")}})
        piexif.insert(exif, path)
    except Exception:
        pass  # piexif optional; PNG is the canonical metadata carrier


def read_infotext(path_or_img) -> Optional[str]:
    img = path_or_img if isinstance(path_or_img, Image.Image) else Image.open(path_or_img)
    return img.info.get("parameters")


_INVALID_FN = re.compile(r'[\\/:*?"<>|\n\r]')


def apply_filename_pattern(pattern: str, seed: int = 0, prompt: str = "", **extra) -> str:
    now = datetime.datetime.now()
    words = _INVALID_FN.sub("", prompt)[:120]
    repl = {
        "[seed]": str(seed),
        "[prompt_spaces]": words,
        "[prompt]": words.replace(" ", "_"),
        "[date]": now.strftime("%Y-%m-%d"),
        "[datetime]": now.strftime("%Y%m%d%H%M%S"),
        "[width]": str(extra.get("width", "")),
        "[height]": str(extra.get("height", "")),
        "[model_name]": str(extra.get("model_name", "")),
        "[sampler]": str(extra.get("sampler", "")),
        "[steps]": str(extra.get("steps", "")),
        "[cfg]": str(extra.get("cfg", "")),
    }
    out = pattern
    for k, v in repl.items():
        out = out.replace(k, v)
    return out or str(seed)


def _match_histogram_channel(src: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """CDF histogram matching of one channel (the skimage match_histograms
    algorithm the reference relies on, done directly in numpy)."""
    s_values, bin_idx, s_counts = np.unique(
        src.ravel(), return_inverse=True, return_counts=True)
    t_values, t_counts = np.unique(tgt.ravel(), return_counts=True)
    s_quantiles = np.cumsum(s_counts) / src.size
    t_quantiles = np.cumsum(t_counts) / tgt.size
    mapped = np.interp(s_quantiles, t_quantiles, t_values)
    return mapped[bin_idx].reshape(src.shape)


def setup_color_correction(image: np.ndarray) -> np.ndarray:
    """Snapshot the init image's LAB histogram target (reference
    processing.py:745 setup_color_correction)."""
    import cv2

    return cv2.cvtColor(np.asarray(image, np.uint8), cv2.COLOR_RGB2LAB)


def apply_color_correction(correction: np.ndarray, image: np.ndarray) -> np.ndarray:
    """Histogram-match a generated image to the init image in LAB space
    (reference processing.py:751 apply_color_correction)."""
    import cv2

    lab = cv2.cvtColor(np.asarray(image, np.uint8), cv2.COLOR_RGB2LAB)
    matched = np.stack([
        _match_histogram_channel(lab[..., c], correction[..., c])
        for c in range(3)
    ], axis=-1).astype(np.uint8)
    return cv2.cvtColor(matched, cv2.COLOR_LAB2RGB)


def image_grid(images: List[np.ndarray], rows: Optional[int] = None) -> np.ndarray:
    n = len(images)
    if rows is None:
        rows = int(math.sqrt(n)) or 1
    cols = math.ceil(n / rows)
    h, w, c = images[0].shape
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i, img in enumerate(images):
        r, cc = divmod(i, cols)
        grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = img
    return grid


# ---------------------------------------------------------------------------
# infotext parsing — canonical implementation lives in pipeline/infotext.py
# (full reference-parity serializer/parser); re-exported here for callers.

from .infotext import (  # noqa: E402,F401
    infotext_to_processing_args,
    parse_generation_parameters,
)

