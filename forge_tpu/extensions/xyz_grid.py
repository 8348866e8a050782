"""X/Y/Z grid: sweep generation parameters and assemble a labeled grid.

Behavioral twin of the reference's scripts/xyz_grid.py (the most-used builtin
script): pick axes (any Processing field or prompt S/R), generate every
combination, compose a grid image with axis legends.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class Axis:
    field: str               # Processing field name, or "prompt_sr"
    values: Sequence[Any]
    search: Optional[str] = None  # for prompt S/R: substring replaced by value

    def apply(self, p, value):
        if self.field == "prompt_sr":
            p.prompt = p.prompt.replace(self.search or str(self.values[0]), str(value))
        else:
            setattr(p, self.field, type(getattr(p, self.field))(value)
                    if getattr(p, self.field) is not None else value)

    def label(self, value) -> str:
        name = self.search or self.field
        return f"{name}: {value}"


def _draw_label(img: np.ndarray, text: str) -> np.ndarray:
    from PIL import Image, ImageDraw

    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    draw.rectangle([0, 0, min(8 * len(text) + 8, pil.width), 14], fill=(0, 0, 0))
    draw.text((4, 2), text, fill=(255, 255, 255))
    return np.asarray(pil)


def run_xyz_grid(
    engine,
    base,  # Processing template
    x_axis: Axis,
    y_axis: Optional[Axis] = None,
    z_axis: Optional[Axis] = None,
    process_fn: Optional[Callable] = None,
    draw_legends: bool = True,
) -> List[np.ndarray]:
    """→ one grid image per Z value (reference draws the same)."""
    import copy

    from ..pipeline.processing import process_images

    process_fn = process_fn or process_images
    ys = y_axis.values if y_axis else [None]
    zs = z_axis.values if z_axis else [None]

    grids = []
    for zv in zs:
        rows = []
        for yv in ys:
            row = []
            for xv in x_axis.values:
                p = copy.copy(base)
                p.all_seeds = p.all_subseeds = None
                x_axis.apply(p, xv)
                if y_axis and yv is not None:
                    y_axis.apply(p, yv)
                if z_axis and zv is not None:
                    z_axis.apply(p, zv)
                img = process_fn(engine, p).images[0]
                if draw_legends:
                    label = x_axis.label(xv)
                    if y_axis and yv is not None:
                        label += f" | {y_axis.label(yv)}"
                    img = _draw_label(img, label)
                row.append(img)
            rows.append(np.concatenate(row, axis=1))
        grid = np.concatenate(rows, axis=0)
        if draw_legends and z_axis and zv is not None:
            grid = _draw_label(grid, z_axis.label(zv))
        grids.append(grid)
    return grids
