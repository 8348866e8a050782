"""Tracing / profiling / observability.

TPU equivalents of the reference's aux subsystems (SURVEY.md §5):
  * jax.profiler trace wrapper  ↔ torch.profiler wrapper (modules/profiling.py)
  * hierarchical startup Timer  ↔ modules/timer.py
  * HBM memory monitor          ↔ VRAM monitor thread (modules/memmon.py)
  * NaN guard                   ↔ devices.test_for_nans (actionable messages)
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Any, Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "traces", enabled: bool = True):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Hierarchical phase timer (reference modules/timer.py:5-91)."""

    def __init__(self, name: str = "total"):
        self.name = name
        self.start = time.time()
        self.records: Dict[str, float] = {}
        self.subcategory_level = 0
        self._category_stack: List[str] = []

    def elapsed(self) -> float:
        now = time.time()
        out = now - self.start
        self.start = now
        return out

    def record(self, category: str):
        prefix = "/".join(self._category_stack)
        key = f"{prefix}/{category}" if prefix else category
        self.records[key] = self.records.get(key, 0.0) + self.elapsed()

    @contextlib.contextmanager
    def subcategory(self, name: str):
        self.elapsed()
        self._category_stack.append(name)
        try:
            yield
        finally:
            self.record("total")
            self._category_stack.pop()

    def summary(self) -> str:
        total = sum(v for k, v in self.records.items() if "/" not in k)
        parts = ", ".join(f"{k}: {v:.1f}s" for k, v in sorted(self.records.items(), key=lambda kv: -kv[1]))
        return f"{self.name}: {total:.1f}s ({parts})"


startup_timer = Timer("startup")


class MemoryMonitor:
    """Samples device memory peaks during a job (reference memmon.py)."""

    def __init__(self, interval: float = 0.5):
        self.interval = interval
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.peak = 0
        self.baseline = 0

    def _device_bytes(self) -> int:
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats() or {}
            return int(stats.get("bytes_in_use", 0))
        except Exception:
            return 0

    def start(self):
        self.baseline = self._device_bytes()
        self.peak = self.baseline
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, self._device_bytes())
            self._stop.wait(self.interval)

    def stop(self) -> Dict[str, int]:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1)
        return {"baseline": self.baseline, "peak": self.peak}


class NansException(Exception):
    pass


def test_for_nans(x, where: str = "unet", enabled: bool = True):
    """Actionable NaN detection (reference devices.py test_for_nans, called at
    processing.py:1006; disable like --disable-nan-check)."""
    if not enabled:
        return
    if hasattr(x, "devices"):
        # device array: reduce to ONE scalar on device — fetching the whole
        # tensor costs ~35 ms for an SDXL latent over the tunnel (20 MB/s)
        import jax.numpy as jnp

        bad = not bool(jnp.isfinite(x.astype(jnp.float32)).all())
    else:
        arr = np.asarray(x, dtype=np.float32)
        bad = bool(np.isnan(arr).any() or np.isinf(arr).any())
    if bad:
        raise_nans(where)


def raise_nans(where: str):
    """Raise the actionable per-stage message (also used by the fused
    decode+check program, pipeline/engine.py decode_to_uint8_checked)."""
    if where == "unet":
        message = (
            "A tensor with NaNs was produced in the UNet. This could be "
            "caused by a model trained in a different precision, a broken "
            "LoRA, or bad conditioning. Try float32 compute dtype."
        )
    elif where == "vae":
        message = (
            "A tensor with NaNs was produced in the VAE. Use a fixed "
            "fp16-safe VAE or float32 VAE dtype."
        )
    else:
        message = f"A tensor with NaNs was produced at {where}."
    raise NansException(message)
