"""DeepDanbooru tagger (resnet_custom_v3), pure JAX.

Re-implementation of the reference's deepbooru interrogator
(modules/deepbooru.py:53-104 tag_multi + modules/deepbooru_model.py — a
generated 358-conv graph). The graph is a batch-norm-free bottleneck ResNet
whose structure is fully recoverable from the checkpoint's ordered
`n_Conv_{i}.weight` shapes, so instead of transcribing the generated
forward, `build_plan` walks the shapes and emits block specs:

  stem:      7×7 s2 (TF-SAME pad [2,3]) → relu → maxpool 3×3 s2 (pad [0,1], -inf)
  stage head A (proj-first, deepbooru_model.py:27-31):  proj 1×1 [s2 unless
             first stage] ∥ (reduce 1×1 → 3×3 [s2] → expand 1×1)
  mid-stage downsample B (proj-last, :114-117 convs 97-100): same but the
             projection conv follows the bottleneck in index order
  identity:  reduce → 3×3 → expand, residual add
  head:      1×1 → global mean → sigmoid  (:667-671)

Stride-2 3×3 convs use asymmetric TF-SAME padding [0,1] — the torch graph's
F.pad(...,[0,1,0,1]) — which JAX expresses directly in conv padding.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn


def _k(p, i):
    return p.get(f"n_Conv_{i}")


def build_plan(params: Mapping[str, Any]) -> List[Tuple]:
    """Ordered conv shapes → [('stem', i), ('block', proj|None, reduce, c3,
    expand, stride), ('head', i)]."""
    n = 0
    while _k(params, n) is not None:
        n += 1

    def shape(i):  # HWIO
        return tuple(_k(params, i)["weight"].shape)

    plan: List[Tuple] = [("stem", 0)]
    trunk = shape(0)[-1]
    i = 1
    first_stage = True
    while i < n:
        if i == n - 1:
            plan.append(("head", i))
            break
        kh, kw, cin, cout = shape(i)
        nxt = shape(i + 1) if i + 1 < n else None
        if kh == 1 and cin == trunk and nxt and nxt[0] == 1 and nxt[2] == trunk and nxt[3] < cout:
            # A: projection first, then bottleneck
            stride = 1 if first_stage else 2
            plan.append(("block", i, i + 1, i + 2, i + 3, stride))
            trunk = cout
            first_stage = False
            i += 4
            continue
        # reduce begins a bottleneck; check for a trailing projection (B)
        expand_out = shape(i + 2)[-1]
        if i + 3 < n - 1:
            k3 = shape(i + 3)
            if k3[0] == 1 and k3[2] == trunk and k3[3] == expand_out and expand_out == trunk:
                plan.append(("block", i + 3, i, i + 1, i + 2, 2))
                i += 4
                continue
        plan.append(("block", None, i, i + 1, i + 2, 1))
        trunk = expand_out
        i += 3
    return plan


def _conv(p, x, stride=1, pad=None):
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=pad or [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(y.dtype)


def deepbooru_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,3] in [0,1] → tag probabilities [B, n_tags]."""
    plan = build_plan(params)
    for spec in plan:
        if spec[0] == "stem":
            x = _conv(_k(params, spec[1]), x, stride=2, pad=[(2, 3), (2, 3)])
            x = jax.nn.relu(x)
            x = jax.lax.reduce_window(
                jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                        constant_values=-np.inf),
                -np.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        elif spec[0] == "block":
            _, proj, red, c3, exp, stride = spec
            sp = [(0, 1), (0, 1)] if stride == 2 else [(1, 1), (1, 1)]
            h = jax.nn.relu(_conv(_k(params, red), x))
            h = jax.nn.relu(_conv(_k(params, c3), h, stride=stride, pad=sp))
            h = _conv(_k(params, exp), h)
            skip = x if proj is None else _conv(_k(params, proj), x, stride=stride)
            x = jax.nn.relu(h + skip)
        else:  # head
            x = _conv(_k(params, spec[1]), x)
            x = jnp.mean(x, axis=(1, 2))
            x = jax.nn.sigmoid(x)
    return x


_RE_SPECIAL = re.compile(r"([\\()])")


class DeepDanbooru:
    """Loader + tag formatter (reference modules/deepbooru.py:53-104)."""

    def __init__(self, model_dir: str = "models/torch_deepdanbooru"):
        self.model_dir = model_dir
        self.params: Optional[Dict[str, Any]] = None
        self.tags: List[str] = []
        self._jit = None

    @property
    def available(self) -> bool:
        try:
            self.load()
            return self.params is not None
        except Exception:
            return False

    def load(self, path: Optional[str] = None):
        if self.params is not None:
            return
        if path is None:
            if not os.path.isdir(self.model_dir):
                return
            cands = [f for f in sorted(os.listdir(self.model_dir))
                     if f.endswith((".pt", ".pth", ".safetensors"))]
            if not cands:
                return
            path = os.path.join(self.model_dir, cands[0])
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(path)
        self.tags = [t for t in sd.pop("tags", [])]
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})
        self._jit = jax.jit(lambda t: deepbooru_apply(self.params, t))

    def probabilities(self, image: np.ndarray) -> np.ndarray:
        """image uint8/float [H,W,3] → per-tag probabilities."""
        self.load()
        if self.params is None:
            raise RuntimeError(f"no deepbooru checkpoint under {self.model_dir}")
        from PIL import Image

        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = np.clip(img * (255 if img.max() <= 1.5 else 1), 0, 255).astype(np.uint8)
        pil = Image.fromarray(img).convert("RGB").resize((512, 512), Image.LANCZOS)
        x = jnp.asarray(np.asarray(pil, np.float32)[None] / 255.0)
        return np.asarray(self._jit(x))[0]

    def tag(self, image: np.ndarray, threshold: float = 0.5,
            alpha_sort: bool = False, use_spaces: bool = True,
            use_escape: bool = True, include_ranks: bool = False,
            filter_tags: str = "") -> str:
        probs = self.probabilities(image)
        picked = {t: float(pr) for t, pr in zip(self.tags, probs)
                  if pr >= threshold and not t.startswith("rating:")}
        names = (sorted(picked) if alpha_sort
                 else [t for t, _ in sorted(picked.items(), key=lambda kv: -kv[1])])
        filtered = {x.strip().replace(" ", "_") for x in filter_tags.split(",")}
        out = []
        for t in names:
            if t in filtered:
                continue
            s = t.replace("_", " ") if use_spaces else t
            if use_escape:
                s = _RE_SPECIAL.sub(r"\\\1", s)
            if include_ranks:
                s = f"({s}:{picked[t]:.3f})"
            out.append(s)
        return ", ".join(out)


_MODEL: Optional[DeepDanbooru] = None


def get_deepbooru() -> DeepDanbooru:
    global _MODEL
    if _MODEL is None:
        _MODEL = DeepDanbooru()
    return _MODEL
