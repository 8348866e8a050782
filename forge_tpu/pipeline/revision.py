"""Revision workflow: CLIP-vision image embeds drive SDXL's pooled conditioning.

Behavioral twin of the reference's forge_preprocessor_revision extension
(extensions-builtin/forge_preprocessor_revision/scripts/preprocessor_revision.py):
the unit image is encoded by CLIP-ViT-bigG-with-projection to a 1280-d image
embedding; weighted embeddings from all Revision units are summed and written
into the first 1280 channels of the SDXL `y` vector (the pooled-text slot) on
the positive cond, while the negative cond's slot is zeroed (:49-56). The
'ignore prompt' variant additionally zeroes the cross-attention context
(:58-60). SDXL has no unCLIP noise augmentor, so the reference's
noise-augmentation branch is a no-op for every supported model (its slider is
hidden, :75) — this rebuild takes the skip path (:31-32) unconditionally.

TPU shape: no conditioning_modifier mutation per step — the y substitution is
a one-time cond-dict rewrite before the compiled loop (the embeds are
step-invariant data, so rewriting the inputs is equivalent to the reference's
per-call deepcopy+overwrite and costs nothing inside the scan).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


def encode_revision_embed(clip_vision_params: Any, img_u8: np.ndarray,
                          weight: float) -> jnp.ndarray:
    """unit image → weighted [1,1280] bigG projected image embedding."""
    from ..models.clipvision import clip_vision_apply, preprocess

    projected, _, _ = clip_vision_apply(clip_vision_params,
                                        jnp.asarray(preprocess(img_u8)))
    return projected.astype(jnp.float32) * float(weight)


def apply_revision(p, cond: Mapping[str, Any], uncond: Mapping[str, Any],
                   embed, ignore_prompt: bool) -> None:
    """Accumulate this unit's embed and rewrite cond/uncond in place.

    Mirrors preprocessor_revision.py:18-45: Σ wᵢ·embedᵢ over units, written
    to y[:, :1280] of cond; zeros for uncond."""
    acc = getattr(p, "_revision_embeds", None) or []
    acc = acc + [embed]
    p._revision_embeds = acc
    total = sum(acc)

    y = cond.get("y")
    if y is None or (hasattr(y, "ndim") and y.ndim != 2):
        raise ValueError("Revision needs an SDXL-family engine (y conditioning)")
    # the pooled-text slot is the first `embed_width` channels of y (1280 for
    # real bigG — the reference's hardcoded :51; derived here so synthetic
    # narrow towers work identically)
    slot = int(total.shape[-1])
    new_y = jnp.asarray(y).at[:, :slot].set(
        jnp.broadcast_to(total, (y.shape[0], slot)).astype(y.dtype))
    cond["y"] = new_y
    uy = uncond.get("y")
    if uy is not None and getattr(uy, "ndim", 0) == 2:
        uncond["y"] = jnp.asarray(uy).at[:, :slot].set(0.0)

    if ignore_prompt or getattr(p, "_revision_ignore_prompt", False):
        p._revision_ignore_prompt = True
        for c in (cond, uncond):
            ctx = c.get("context")
            if ctx is not None and not isinstance(ctx, (int, float)):
                c["context"] = jnp.zeros_like(jnp.asarray(ctx))
    p.extra_generation_params.setdefault("Revision", "enabled")
