"""Runtime options registry: sectioned OptionInfo entries with persistence,
onchange hooks, and per-request overrides.

The behavioral twin of the reference's three-tier config system
(modules/options.py + shared_options.py ≈250 options + per-request
override_settings, processing.py:820-847): a typed registry, JSON
persistence, and a context manager for scoped overrides.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
from typing import Any, Callable, Dict, Optional


class OptionInfo:
    def __init__(self, default: Any, label: str, section: str = "general",
                 choices: Optional[list] = None, onchange: Optional[Callable] = None):
        self.default = default
        self.label = label
        self.section = section
        self.choices = choices
        self.onchange = onchange


class Options:
    def __init__(self):
        self._registry: Dict[str, OptionInfo] = {}
        self._values: Dict[str, Any] = {}
        self._lock = threading.RLock()
        self._overrides = threading.local()

    def add(self, key: str, info: OptionInfo):
        self._registry[key] = info

    def __getattr__(self, key: str):
        if key.startswith("_"):
            raise AttributeError(key)
        return self.get(key)

    def get(self, key: str):
        ov = getattr(self._overrides, "stack", None)
        if ov:
            for frame in reversed(ov):
                if key in frame:
                    return frame[key]
        with self._lock:
            if key in self._values:
                return self._values[key]
            if key in self._registry:
                return self._registry[key].default
        raise KeyError(key)

    def set(self, key: str, value: Any, run_onchange: bool = True):
        with self._lock:
            old = self.get(key) if key in self._registry else None
            self._values[key] = value
            info = self._registry.get(key)
        if run_onchange and info is not None and info.onchange and old != value:
            info.onchange()

    @contextlib.contextmanager
    def override(self, values: Dict[str, Any]):
        """Per-request scoped overrides (reference override_settings)."""
        if not hasattr(self._overrides, "stack"):
            self._overrides.stack = []
        self._overrides.stack.append(dict(values))
        try:
            yield
        finally:
            self._overrides.stack.pop()

    def save(self, path: str):
        with self._lock:
            data = dict(self._values)
        with open(path, "w") as f:
            json.dump(data, f, indent=2, default=str)

    def load(self, path: str):
        if not os.path.exists(path):
            return
        with open(path) as f:
            data = json.load(f)
        with self._lock:
            self._values.update(data)

    def dump_registry(self) -> Dict[str, Dict[str, Any]]:
        return {
            k: {"default": i.default, "label": i.label, "section": i.section,
                "value": self.get(k)}
            for k, i in self._registry.items()
        }


opts = Options()

# core option set (subset of shared_options.py; grows with features)
_DEFAULTS = {
    "sd_model_checkpoint": OptionInfo(None, "Checkpoint", "sd"),
    "sd_vae": OptionInfo("Automatic", "VAE", "sd"),
    "CLIP_stop_at_last_layers": OptionInfo(1, "Clip skip", "sd"),
    "eta_noise_seed_delta": OptionInfo(0, "ENSD", "sampler"),
    "eta_ancestral": OptionInfo(1.0, "Eta for ancestral samplers", "sampler"),
    "s_churn": OptionInfo(0.0, "Sigma churn", "sampler"),
    "s_noise": OptionInfo(1.0, "Sigma noise", "sampler"),
    "emphasis_mode": OptionInfo("Original", "Emphasis mode", "sd",
                               choices=["None", "Ignore", "Original", "No norm"]),
    "comma_padding_backtrack": OptionInfo(20, "Prompt comma backtrack", "sd"),
    "randn_source": OptionInfo("NV", "RNG source", "compat", choices=["NV", "CPU"]),
    "disable_nan_check": OptionInfo(False, "Skip NaN checks after UNet/VAE", "compat"),
    "samples_save": OptionInfo(True, "Always save generated images", "saving"),
    "samples_format": OptionInfo("png", "Image format", "saving"),
    "outdir_txt2img_samples": OptionInfo("outputs/txt2img-images", "txt2img out dir", "saving"),
    "outdir_img2img_samples": OptionInfo("outputs/img2img-images", "img2img out dir", "saving"),
    "enable_pnginfo": OptionInfo(True, "Write infotext into images", "saving"),
    "live_previews_enable": OptionInfo(True, "Live previews", "ui"),
    "show_progress_every_n_steps": OptionInfo(10, "Live preview period", "ui"),
    "attention_impl": OptionInfo("auto", "Attention implementation", "perf",
                                 choices=["auto", "flash", "xla"]),
    "compute_dtype": OptionInfo("auto", "UNet compute dtype", "perf",
                                choices=["auto", "bfloat16", "float32"]),
}
for _k, _v in _DEFAULTS.items():
    opts.add(_k, _v)
