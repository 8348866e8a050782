"""HBM budget planning.

What remains of the reference's 1,209-LoC VRAM state machine
(backend/memory_management.py) after the TPU redesign: the load-time
decisions. XLA preallocates and cannot catch OOM mid-graph, so instead of
reactive eviction/slicing ladders we *plan*: estimate activation+weight needs
before compiling a shape and choose (batch chunking, tiled VAE, quantized
weights, host-offload) up front. Heuristic constants calibrated against the
reference's published memory model (k_model.py:47-57, patcher/vae.py:65-66).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def device_memory() -> dict:
    """{'total': bytes, 'used': bytes, 'free': bytes} for device 0."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        total = int(stats.get("bytes_limit", 0))
        used = int(stats.get("bytes_in_use", 0))
        return {"total": total, "used": used, "free": max(total - used, 0)}
    except Exception:
        return {"total": 0, "used": 0, "free": 0}


def unet_activation_bytes(batch: int, height: int, width: int,
                          dtype_size: int = 2, flash: bool = True) -> int:
    """Reference activation model: scaler·B·H·W·dtype·16384 with scaler 1.28
    for memory-efficient attention (k_model.py:47-57). H/W in pixels.

    Calibrated up from the reference's 1.28: our cross-attention runs as an
    einsum (materialized logits) and XLA keeps more fusion temporaries live —
    CFG batch 8 at 1024² measured-OOMs on a 16 GB chip where the 1.28 model
    predicted a fit, so oversized batches must chunk earlier."""
    scaler = 2.2 if flash else 2.6
    return int(scaler * batch * height * width * dtype_size * 16384 / 64)


def vae_decode_bytes(latent_h: int, latent_w: int, dtype_size: int = 2,
                     batch: int = 1) -> int:
    """Reference VAE estimate: 2178·H·W·64·dtype per latent pixel
    (patcher/vae.py:65-66), scaled by batch."""
    return int(batch * 2178 * latent_h * latent_w * 64 * dtype_size / 2)


@dataclasses.dataclass
class Plan:
    batch_chunk: int          # images per compiled forward
    tiled_vae: bool
    note: str = ""


def plan_generation(batch: int, height: int, width: int,
                    weight_bytes: int, free_bytes: Optional[int] = None,
                    reserve: int = 1 << 30) -> Plan:
    """Decide chunking/tiling for a generation (the reference decides the
    same things reactively at sampling_function.py:208-236 and vae.py:143)."""
    free = device_memory()["free"] if free_bytes is None else free_bytes
    if free <= 0:  # stats unavailable — assume 16 GiB chip minus weights
        free = (16 << 30) - weight_bytes
    budget = max(free - reserve, 1 << 28)

    chunk = batch
    while chunk > 1 and unet_activation_bytes(chunk * 2, height, width) > budget:
        chunk = (chunk + 1) // 2

    tiled = vae_decode_bytes(height // 8, width // 8, batch=chunk) > budget
    note = ""
    if chunk < batch:
        note += f"batch chunked {batch}->{chunk}; "
    if tiled:
        note += "tiled VAE; "
    return Plan(batch_chunk=chunk, tiled_vae=tiled, note=note.strip())
