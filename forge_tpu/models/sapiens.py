"""Sapiens-style ViT dense predictor in JAX — the human normal-estimation net
behind the bundled sapiens_normal Space.

The reference's forge_space_sapiens_normal (extensions-builtin/
forge_space_sapiens_normal/forge_app.py:24-45) downloads Meta's Sapiens
torchscript exports (`sapiens_*_normal_render_people_*.pt2`) and runs them as
opaque jit modules. Torchscript bundles code with weights and cannot be
re-executed on TPU, so the TPU build re-expresses the published Sapiens
architecture (plain ViT encoder + deconv dense head, the mmseg
VisionTransformer + VitHead pairing) as a tree-driven pure function and loads
ordinary state-dict checkpoints (safetensors/.pth) from models/sapiens.

Topology is derived from checkpoint shapes, nothing is hard-coded:
depth = number of `blocks.N` entries, width/patch from `patch_embed.proj`,
head deconv stack from `head.deconv.N` keys. Key layout (this port's ABI):

    patch_embed.proj.{weight HWIO, bias}
    pos_embed                               [1, L, D] or [L, D]
    blocks.{i}.norm1|norm2.{weight,bias}
    blocks.{i}.attn.qkv.{weight [3D,D], bias}
    blocks.{i}.attn.proj.{weight,bias}
    blocks.{i}.mlp.fc1|fc2.{weight,bias}
    norm.{weight,bias}
    head.deconv.{j}.{weight,bias}           ConvTranspose2d stride 2, k4 p1
    head.conv.{weight,bias}                 1x1 or 3x3 → out channels

Output: [B, H', W', C_out] at deconv-upsampled patch-grid resolution
(C_out = 3 for normals, num_classes for the seg checkpoint).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from ..ops.attention import attention

# The reference app's fixed inference geometry and ImageNet-ish statistics
# (forge_space_sapiens_normal/forge_app.py:58-62 transform_fn).
INPUT_H, INPUT_W = 1024, 768
MEAN = np.asarray([123.5, 116.5, 103.5], np.float32) / 255.0
STD = np.asarray([58.5, 57.0, 57.5], np.float32) / 255.0


def sapiens_apply(params: Mapping[str, Any], pixels: jax.Array) -> jax.Array:
    """[B, H, W, 3] normalized pixels → [B, H', W', C_out] dense prediction."""
    pw = params["patch_embed"]["proj"]["weight"]  # HWIO after load transform
    patch = pw.shape[0]
    x = nn.conv2d(pixels, params["patch_embed"]["proj"], stride=patch)
    b, gh, gw, width = x.shape
    x = x.reshape(b, gh * gw, width)

    pos = params["pos_embed"]
    pos = pos.reshape(-1, pos.shape[-1])
    # Sapiens has no CLS token; tolerate checkpoints that carry one by
    # dropping the leading position when lengths differ by exactly one.
    if pos.shape[0] == x.shape[1] + 1:
        pos = pos[1:]
    x = x + pos[: x.shape[1]].astype(x.dtype)

    blocks = params["blocks"]
    heads = max(1, width // 64)
    for i in range(len(blocks)):
        bp = blocks[str(i)]
        h = nn.layer_norm(x, bp["norm1"])
        qkv = nn.linear(h, bp["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + nn.linear(attention(q, k, v, heads=heads), bp["attn"]["proj"])
        h = nn.layer_norm(x, bp["norm2"])
        x = x + nn.linear(nn.gelu(nn.linear(h, bp["mlp"]["fc1"])), bp["mlp"]["fc2"])

    x = nn.layer_norm(x, params["norm"])
    y = x.reshape(b, gh, gw, width)

    head = params["head"]
    deconvs = head.get("deconv", {})
    for j in range(len(deconvs)):
        dp = deconvs[str(j)]
        y = nn.conv2d_transpose(y, dp, stride=2,
                                padding=(dp["weight"].shape[0] - 2) // 2)
        y = jax.nn.relu(y)
    kh = head["conv"]["weight"].shape[0]
    return nn.conv2d(y, head["conv"], padding=kh // 2)


class SapiensNormal:
    """Load-once runner: preprocess → jit apply → postprocess, mirroring the
    reference app's process_image (forge_app.py:66-95) including the
    person-mask step (their seg checkpoint; here the already-shipped U²-Net
    matter serves as the person/foreground mask when available)."""

    def __init__(self, model_dir: str = "models/sapiens",
                 mask_model_dir: Optional[str] = "models/u2net"):
        self.model_dir = model_dir
        self.mask_model_dir = mask_model_dir
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

    def normals(self, img: np.ndarray, mask_background: bool = True) -> np.ndarray:
        """uint8 [H,W,3] → uint8 [H,W,3] normal-map visualization
        ((n̂+1)/2·255 with background at -1, per the reference app)."""
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no sapiens checkpoint under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(sapiens_apply)
        h, w = img.shape[:2]
        feed = cv2.resize(img, (INPUT_W, INPUT_H), interpolation=cv2.INTER_AREA)
        feed = (feed.astype(np.float32) / 255.0 - MEAN) / STD
        out = np.asarray(self._jit(self.params, jnp.asarray(feed[None]))[0],
                         np.float32)
        normal = cv2.resize(out, (w, h), interpolation=cv2.INTER_LINEAR)

        if mask_background and self.mask_model_dir:
            from .u2net import U2NetMatter

            matter = U2NetMatter(model_dir=self.mask_model_dir)
            if matter.available:
                m = matter.mask(img) > 0.5
                normal[~m] = -1.0

        norm = np.linalg.norm(normal, axis=-1, keepdims=True)
        unit = normal / (norm + 1e-5)
        return ((unit + 1.0) / 2.0 * 255.0).clip(0, 255).astype(np.uint8)
