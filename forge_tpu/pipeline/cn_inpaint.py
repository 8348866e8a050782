"""ControlNet inpaint preprocessors (inpaint_global_harmonious / inpaint_only).

Behavioral twin of the reference's forge_preprocessor_inpaint extension
(extensions-builtin/forge_preprocessor_inpaint/scripts/preprocessor_inpaint.py):

* both modules mix the mask into the control hint — masked pixels become −1
  (`mixed_cond = cond·(1−mask) − mask`, :29-30) so the inpaint ControlNet sees
  where to fill;
* `inpaint_only` additionally (a) composites the denoised latent with the
  VAE-encoded source outside the (8×-maxpooled) latent mask every step
  (:60-70 pre/post-CFG pair — here the existing masked-composite scan path),
  and (b) composites the final uint8 image with the source under a
  dilate(7)+blur(7) feathered mask (:82-98 process_after_every_sampling).

The LaMa variant's neural pre-fill lives in preprocessors/lama.py; its
latent-noise shift (:160-163) rides the same state object.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def mix_hint(img_f: np.ndarray, mask_f: np.ndarray) -> np.ndarray:
    """img [H,W,3] in [0,1], mask [H,W] in [0,1] → hint with masked px = −1."""
    m = np.round(mask_f)[..., None]
    return img_f * (1.0 - m) - m


def latent_mask_from_pixels(mask_f: np.ndarray) -> np.ndarray:
    """[H,W] pixel mask → [1,H/8,W/8,1] latent mask via 8×8 max-pool
    (preprocessor_inpaint.py:55-57): any covered pixel marks the latent cell.
    Convention matches the sampler composite: 1 = regenerate, 0 = keep."""
    m = np.round(mask_f).astype(np.float32)
    h, w = m.shape
    m = m[: h - h % 8, : w - w % 8]
    m = m.reshape(h // 8, 8, w // 8, 8).max(axis=(1, 3))
    return np.round(m)[None, ..., None]


def attach_inpaint_only(engine, p, img_u8: np.ndarray, mask_f: np.ndarray,
                        lama_shift: bool = False) -> None:
    """Deferred-hook body: VAE-encode the source and arm the latent+final
    composites for the sampling pass (consumed in pipeline/processing.py)."""
    from ..preprocessors.cv import bilinear_resize

    arr = np.asarray(img_u8, np.float32) / 255.0
    arr = bilinear_resize(arr, p.height, p.width)
    mask = np.clip(bilinear_resize(
        np.repeat(np.asarray(mask_f, np.float32)[..., None], 3, 2),
        p.height, p.width)[..., 0], 0.0, 1.0)
    latent = engine.encode_first_stage(
        jnp.asarray(arr[None] * 2.0 - 1.0, jnp.float32))
    lmask = jnp.asarray(latent_mask_from_pixels(mask), jnp.float32)
    p._cn_inpaint = {
        "latent": latent,
        "latent_mask": lmask,
        "image": arr,          # [H,W,3] float [0,1] for the final composite
        "mask": mask,          # [H,W] float
        "lama_shift": bool(lama_shift),
    }
    p.extra_generation_params.setdefault("ControlNet inpaint", "inpaint_only")


def composite_final(p, img_u8: np.ndarray) -> np.ndarray:
    """Final uint8 composite under a dilated+blurred mask
    (preprocessor_inpaint.py:85-96, σ=7)."""
    import cv2

    st = getattr(p, "_cn_inpaint", None)
    if st is None:
        return img_u8
    sigma = 7
    mask = cv2.dilate(st["mask"], np.ones((sigma, sigma), np.uint8))
    mask = np.clip(cv2.blur(mask, (sigma, sigma)), 0.0, 1.0)[..., None]
    raw = st["image"]
    if raw.shape[:2] != img_u8.shape[:2]:
        from ..preprocessors.cv import bilinear_resize

        raw = bilinear_resize(raw, img_u8.shape[0], img_u8.shape[1])
        mask = bilinear_resize(np.repeat(mask, 3, 2),
                               img_u8.shape[0], img_u8.shape[1])[..., :1]
    out = raw * 255.0 * (1.0 - mask) + img_u8.astype(np.float32) * mask
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)
