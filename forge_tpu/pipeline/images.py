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


def _opt(key, default):
    from ..runtime.options import opts

    try:
        return opts.get(key)
    except KeyError:
        return default


def save_image(
    image,
    path: Optional[str] = None,
    outdir: str = "outputs",
    infotext: Optional[str] = None,
    file_format: Optional[str] = None,
    filename_pattern: Optional[str] = None,
    seed: int = 0,
    prompt: str = "",
    quality: Optional[int] = None,
    **pattern_extra,
) -> str:
    """Save with metadata, honoring the reference's saving options
    (images.py:627-788): enable_pnginfo, save_to_dirs + directory pattern,
    samples_filename_pattern, add-number suffixing, jpeg_quality,
    webp_lossless, save_txt sidecar, log.csv append."""
    img = image if isinstance(image, Image.Image) else to_pil(image)
    file_format = (file_format or str(_opt("samples_format", "png"))).lower()
    quality = int(quality if quality is not None else _opt("jpeg_quality", 80))
    if path is None:
        if _opt("save_to_dirs", True):
            sub = apply_filename_pattern(
                str(_opt("directories_filename_pattern", "[date]")) or "[date]",
                seed=seed, prompt=prompt, **pattern_extra)
            outdir = os.path.join(outdir, sub)
        os.makedirs(outdir, exist_ok=True)
        pattern = filename_pattern or str(
            _opt("samples_filename_pattern", "") or "[seed]-[prompt_spaces]")
        name = apply_filename_pattern(pattern, seed=seed, prompt=prompt,
                                      **pattern_extra)
        if _opt("save_images_add_number", True):
            existing = len([f for f in os.listdir(outdir)
                            if f.split("-")[0].isdigit()])
            name = f"{existing:05d}-{name}"
        base = os.path.join(outdir, name)
        path = f"{base}.{file_format}"
        i = 1
        while os.path.exists(path):
            path = f"{base}-{i}.{file_format}"
            i += 1

    from ..runtime.scripts import fire

    fire("before_image_saved", path, img, infotext)

    write_info = bool(_opt("enable_pnginfo", True))
    if file_format == "png":
        pnginfo = PngImagePlugin.PngInfo()
        if infotext and write_info:
            pnginfo.add_text("parameters", infotext)
        img.save(path, format="PNG", pnginfo=pnginfo)
    elif file_format in ("jpg", "jpeg"):
        img.save(path, quality=quality)
        if infotext and write_info:
            _save_exif_comment(path, infotext)
    elif file_format == "webp":
        img.save(path, quality=quality, lossless=bool(_opt("webp_lossless", False)))
        if infotext and write_info:
            _save_exif_comment(path, infotext)
    elif file_format in ("avif", "gif"):
        try:
            img.save(path)
        except Exception:  # PIL without AVIF plugin → fall back to png
            path = os.path.splitext(path)[0] + ".png"
            img.save(path, format="PNG")
    else:
        img.save(path)

    if infotext and _opt("save_txt", False):
        with open(os.path.splitext(path)[0] + ".txt", "w", encoding="utf8") as f:
            f.write(infotext + "\n")
    if _opt("save_write_log_csv", True) and infotext:
        _append_log_csv(os.path.dirname(path), path, prompt, seed, infotext)
    fire("image_saved", path, img, infotext)
    return path


def _append_log_csv(dirname: str, path: str, prompt: str, seed: int,
                    infotext: str) -> None:
    """log.csv next to saved images (reference ui_common save log)."""
    import csv

    log = os.path.join(dirname, "log.csv")
    new = not os.path.exists(log)
    try:
        with open(log, "a", newline="", encoding="utf8") as f:
            w = csv.writer(f)
            if new:
                w.writerow(["filename", "prompt", "seed", "infotext"])
            w.writerow([os.path.basename(path), prompt, seed,
                        infotext.replace("\n", " | ")])
    except OSError:
        pass


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
    """FilenameGenerator token subset (reference images.py:384 — the tokens
    that have a server-side meaning here; UI/style tokens resolve empty)."""
    import hashlib

    now = datetime.datetime.now()
    words = _INVALID_FN.sub("", prompt)[:120]
    max_words = int(_opt("directories_max_prompt_words", 8))
    prompt_words = "_".join(words.split()[:max_words]) or "empty"
    repl = {
        "[seed]": str(seed),
        "[seed_first]": str(extra.get("seed_first", seed)),
        "[prompt_spaces]": words,
        "[prompt]": words.replace(" ", "_"),
        "[prompt_no_styles]": words.replace(" ", "_"),
        "[prompt_words]": prompt_words,
        "[prompt_hash]": hashlib.sha256(prompt.encode()).hexdigest()[:8],
        "[date]": now.strftime("%Y-%m-%d"),
        "[datetime]": now.strftime("%Y%m%d%H%M%S"),
        "[job_timestamp]": str(extra.get("job_timestamp",
                                         now.strftime("%Y%m%d%H%M%S"))),
        "[width]": str(extra.get("width", "")),
        "[height]": str(extra.get("height", "")),
        "[model_name]": str(extra.get("model_name", "")),
        "[model_hash]": str(extra.get("model_hash", "")),
        "[sampler]": str(extra.get("sampler", "")),
        "[sampler_scheduler]": str(extra.get("sampler_scheduler", "")),
        "[steps]": str(extra.get("steps", "")),
        "[cfg]": str(extra.get("cfg", "")),
        "[denoising]": str(extra.get("denoising", "")),
        "[clip_skip]": str(extra.get("clip_skip", "")),
        "[batch_number]": str(extra.get("batch_number", "")),
        "[generation_number]": str(extra.get("generation_number", "")),
        "[user]": str(extra.get("user", "")),
        "[image_hash]": str(extra.get("image_hash", "")),
        "[none]": "",
        "[styles]": "",
    }
    out = pattern
    for k, v in repl.items():
        out = out.replace(k, v)
    return out.strip("-_ ") or str(seed)


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


def image_grid(images: List[np.ndarray], rows: Optional[int] = None,
               margin: int = 0) -> np.ndarray:
    """Cells composited row-major; `margin` px of white between cells
    (reference images.py image_grid + the grid-margins UI option)."""
    n = len(images)
    if rows is None:
        rows = int(math.sqrt(n)) or 1
    cols = math.ceil(n / rows)
    h, w, c = images[0].shape
    m = max(int(margin), 0)
    grid = np.full((rows * h + (rows - 1) * m,
                    cols * w + (cols - 1) * m, c), 255, np.uint8)
    for i, img in enumerate(images):
        r, cc = divmod(i, cols)
        y, x = r * (h + m), cc * (w + m)
        grid[y : y + h, x : x + w] = img
    return grid


# ---------------------------------------------------------------------------
# infotext parsing — canonical implementation lives in pipeline/infotext.py
# (full reference-parity serializer/parser); re-exported here for callers.

from .infotext import (  # noqa: E402,F401
    infotext_to_processing_args,
    parse_generation_parameters,
)



def resize_init_image(img: np.ndarray, w: int, h: int, mode: int = 0,
                      upscaler: str = "", registry=None) -> np.ndarray:
    """Reference images.resize_image semantics for img2img init images:
    mode 0 'Just resize', 1 'Crop and resize' (scale to cover, center
    crop), 2 'Resize and fill' (scale to fit, edges filled by replicating
    the border rows/cols). When enlarging and the `upscaler_for_img2img`
    option names a GAN upscaler, it assists the resize like the reference's
    upscaler-assisted path."""
    from PIL import Image

    ih, iw = img.shape[:2]
    if (ih, iw) == (h, w):
        return img

    def scale_to(tw: int, th: int, src: np.ndarray) -> np.ndarray:
        sh, sw = src.shape[:2]
        if upscaler and upscaler != "None" and registry is not None \
                and (tw > sw or th > sh):
            factor = max(tw / sw, th / sh)
            try:
                src = np.asarray(registry.get(upscaler).upscale(src, factor))
            except KeyError:
                pass  # unknown name: plain resize below
        return np.asarray(Image.fromarray(src.astype(np.uint8)).resize(
            (tw, th), Image.LANCZOS))

    if mode == 1:  # crop and resize: cover, center crop
        k = max(w / iw, h / ih)
        rw, rh = int(round(iw * k)), int(round(ih * k))
        r = scale_to(rw, rh, img)
        top, left = (rh - h) // 2, (rw - w) // 2
        return r[top:top + h, left:left + w]
    if mode == 2:  # resize and fill: fit, replicate border into the gaps
        k = min(w / iw, h / ih)
        rw, rh = max(int(round(iw * k)), 1), max(int(round(ih * k)), 1)
        r = scale_to(rw, rh, img)
        top = (h - rh) // 2
        left = (w - rw) // 2
        return np.pad(r, ((top, h - rh - top), (left, w - rw - left), (0, 0)),
                      mode="edge")
    return scale_to(w, h, img)  # mode 0 / fallback
