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
# infotext parsing (reference infotext_utils.py:251 parse_generation_parameters)

_PARAM_RE = re.compile(r'\s*(\w[\w \-/]+):\s*("(?:\\.|[^\\"])+"|[^,]*)(?:,|$)')


def parse_generation_parameters(text: str) -> Dict[str, Any]:
    """Infotext → {param: value} incl. Prompt / Negative prompt."""
    res: Dict[str, Any] = {}
    if not text:
        return res
    *prompt_lines, lastline = text.strip().split("\n")
    if len(_PARAM_RE.findall(lastline)) < 3:
        prompt_lines.append(lastline)
        lastline = ""

    prompt, negative = [], []
    in_negative = False
    for line in prompt_lines:
        stripped = line.strip()
        if stripped.startswith("Negative prompt:"):
            in_negative = True
            stripped = stripped[len("Negative prompt:"):].strip()
        (negative if in_negative else prompt).append(stripped)

    res["Prompt"] = "\n".join(prompt)
    res["Negative prompt"] = "\n".join(negative)

    for key, value in _PARAM_RE.findall(lastline):
        if value.startswith('"') and value.endswith('"'):
            value = value[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        res[key.strip()] = value.strip()

    if "Size" in res and "x" in str(res["Size"]):
        w, h = res["Size"].split("x")
        res["Width"], res["Height"] = int(w), int(h)
    return res


def infotext_to_processing_args(text: str) -> Dict[str, Any]:
    """Map parsed infotext keys onto Processing field names (the paste-back
    binding, reference infotext_utils.py:113-196)."""
    d = parse_generation_parameters(text)
    out: Dict[str, Any] = {}
    mapping = {
        "Prompt": ("prompt", str),
        "Negative prompt": ("negative_prompt", str),
        "Steps": ("steps", int),
        "Sampler": ("sampler_name", str),
        "Schedule type": ("scheduler", str),
        "CFG scale": ("cfg_scale", float),
        "Seed": ("seed", int),
        "Width": ("width", int),
        "Height": ("height", int),
        "Denoising strength": ("denoising_strength", float),
        "Clip skip": ("clip_skip", int),
        "ENSD": ("eta_noise_seed_delta", int),
        "Variation seed": ("subseed", int),
        "Variation seed strength": ("subseed_strength", float),
        "Hires upscale": ("hr_scale", float),
    }
    for key, (field, cast) in mapping.items():
        if key in d and d[key] != "":
            try:
                out[field] = cast(d[key])
            except (TypeError, ValueError):
                pass
    return out
