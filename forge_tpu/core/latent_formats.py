"""Latent regulation (scale/shift) per model family — the reference's
`process_in/out` latent "regulation" on the VAE patcher (backend/nn/vae.py,
patcher/vae.py)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class LatentFormat:
    scale_factor: float = 0.18215
    shift_factor: float = 0.0
    latent_channels: int = 4

    def process_in(self, latent):
        return (latent - self.shift_factor) * self.scale_factor

    def process_out(self, latent):
        return latent / self.scale_factor + self.shift_factor


SD15 = LatentFormat(scale_factor=0.18215)
SDXL = LatentFormat(scale_factor=0.13025)
SD3 = LatentFormat(scale_factor=1.5305, shift_factor=0.0609, latent_channels=16)
FLUX = LatentFormat(scale_factor=0.3611, shift_factor=0.1159, latent_channels=16)

BY_FAMILY = {
    "sd15": SD15,
    "sd20": SD15,
    "sdxl": SDXL,
    "sdxl_refiner": SDXL,
    "sd3": SD3,
    "flux": FLUX,
    "chroma": FLUX,
}
