"""Extra networks: `<lora:name:weight>` prompt syntax → weight patches.

Behavioral twin of the reference's extra-network lifecycle
(modules/extra_networks.py:126-207 parse/activate +
extensions-builtin/sd_forge_lora/networks.py:68-127 load with dedup/cache):
parse and strip the syntax from prompts, resolve LoRA files from the
registry, and produce patched UNet/text-encoder parameter trees for this
generation (functional COW — the engine's base weights are never mutated).
"""

from __future__ import annotations

import glob
import os
import re
import threading
from typing import Any, Dict, List, Optional, Tuple

from ..core.patches import apply_patches, match_lora
from ..core.state_dict import load_state_dict
from ..core.tree import flatten

_EN_RE = re.compile(r"<(\w+):([^>]+)>")


def _default_multiplier() -> float:
    """<lora:name> with no weight uses the extra_networks_default_multiplier
    option (reference extra_networks.py + shared option)."""
    try:
        from ..runtime.options import opts

        return float(opts.get("extra_networks_default_multiplier"))
    except Exception:  # noqa: BLE001 — options may not be initialized
        return 1.0


class ExtraNetworkParams:
    def __init__(self, kind: str, items: List[str]):
        self.kind = kind
        self.items = items
        self.name = items[0] if items else ""
        default = _default_multiplier()
        self.te_multiplier = float(items[1]) if len(items) > 1 else default
        self.unet_multiplier = float(items[2]) if len(items) > 2 else self.te_multiplier


def parse_prompt(prompt: str) -> Tuple[str, List[ExtraNetworkParams]]:
    found: List[ExtraNetworkParams] = []

    def repl(m):
        found.append(ExtraNetworkParams(m.group(1), m.group(2).split(":")))
        return ""

    return _EN_RE.sub(repl, prompt), found


def parse_prompts(prompts: List[str]) -> Tuple[List[str], List[ExtraNetworkParams]]:
    """Strip syntax from all prompts; network set comes from the first
    (reference behavior: networks are per-generation, not per-image)."""
    cleaned = []
    first: List[ExtraNetworkParams] = []
    for i, p in enumerate(prompts):
        c, found = parse_prompt(p)
        cleaned.append(c)
        if i == 0:
            first = found
    return cleaned, first


def _short_file_hash(path: str, _cache: Dict[str, str] = {}) -> str:
    """10-hex partial sha256 over the file head — same identity scheme as
    CheckpointInfo.short_hash (reference hashes.py sha256-with-cache)."""
    if path not in _cache:
        import hashlib

        h = hashlib.sha256()
        with open(path, "rb") as f:
            h.update(f.read(1 << 20))
        _cache[path] = h.hexdigest()[:10]
    return _cache[path]


class LoraRegistry:
    """LoRA file discovery + state-dict LRU (reference networks.py:56)."""

    def __init__(self, dirs: Optional[List[str]] = None, cache_size: int = 8):
        self.dirs = dirs or ["models/Lora", "models/LyCORIS"]
        self._cache: Dict[str, Any] = {}
        self._cache_order: List[str] = []
        self._cache_size = cache_size
        self._lock = threading.RLock()
        self.refresh()

    def refresh(self):
        with self._lock:
            self.available: Dict[str, str] = {}
            for d in self.dirs:
                for ext in (".safetensors", ".pt", ".ckpt"):
                    for p in sorted(glob.glob(os.path.join(d, f"**/*{ext}"), recursive=True)):
                        self.available[os.path.splitext(os.path.basename(p))[0]] = p

    def load(self, name: str):
        with self._lock:
            if name in self._cache:
                return self._cache[name]
            path = self.available.get(name)
            if path is None:
                raise FileNotFoundError(f"LoRA {name!r} not found in {self.dirs}")
            sd = load_state_dict(path)
            self._cache[name] = sd
            self._cache_order.append(name)
            while len(self._cache_order) > self._cache_size:
                evict = self._cache_order.pop(0)
                self._cache.pop(evict, None)
            return sd


def activate(
    engine,
    prompts: List[str],
    registry: Optional[LoraRegistry] = None,
    p=None,
) -> Tuple[List[str], Any, Dict[str, Any]]:
    """→ (cleaned_prompts, patched_unet_params, {te_name: patched_params}).

    Unknown network kinds are stripped with a warning (the reference raises
    for unknown kinds; we keep generation alive and report). When ``p`` is
    given, records the "Lora hashes" infotext key (reference
    extra_networks_lora.py:56)."""
    cleaned, networks = parse_prompts(prompts)
    loras = [n for n in networks if n.kind == "lora" or n.kind == "lyco"]
    if not loras or registry is None:
        return cleaned, engine.loaded.unet, {}

    if p is not None:
        hashes = {}
        for n in loras:
            path = registry.available.get(n.name)
            if path:
                hashes[n.name] = _short_file_hash(path)
        if hashes:
            p.extra_generation_params["Lora hashes"] = ", ".join(
                f"{k}: {v}" for k, v in hashes.items())

    unet_keys = flatten(engine.loaded.unet).keys()
    te_keys = {name: flatten(te.params).keys() for name, te in engine.text_engines.items()}

    unet_sets = []
    te_sets: Dict[str, list] = {name: [] for name in te_keys}
    for n in loras:
        sd = registry.load(n.name)
        matched, unmatched = match_lora(sd, unet_keys, te_keys_by_name=te_keys)
        if unmatched:
            print(f"lora {n.name}: {len(unmatched)} unmatched modules")
        unet_sets.append((matched["unet"], n.unet_multiplier))
        for te_name in te_keys:
            patches = matched.get(f"te:{te_name}", {})
            if patches:
                te_sets[te_name].append((patches, n.te_multiplier))

    patched_unet = apply_patches(engine.loaded.unet, unet_sets)
    patched_tes = {
        name: apply_patches(engine.text_engines[name].params, sets)
        for name, sets in te_sets.items()
        if sets
    }
    return cleaned, patched_unet, patched_tes
