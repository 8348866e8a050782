"""Checkpoint registry + engine lifecycle.

Twin of the reference's sd_models.py model list + forge_model_reload
(modules/sd_models.py:473): scan checkpoint dirs, keep ONE live engine, and
reload only when the loading-parameters key (path + overrides + dtype)
changes."""

from __future__ import annotations

import glob
import hashlib
import os
import threading
from typing import Any, Dict, List, Optional

from ..pipeline.engine import DiffusionEngine, load_engine

_EXTS = (".safetensors", ".ckpt", ".sft", ".pt")

# --no-hashing (reference cmd_args): skip checkpoint sha256 for faster
# startup; infotext Model hash falls back to empty. Set by webui.main().
NO_HASHING = False


class CheckpointInfo:
    def __init__(self, path: str):
        self.path = path
        self.name = os.path.basename(path)
        self.title = self.name
        self._hash: Optional[str] = None

    def short_hash(self) -> str:
        if NO_HASHING:
            return ""
        if self._hash is None:
            h = hashlib.sha256()
            with open(self.path, "rb") as f:
                # hash header region only — fast identity, like the webui's
                # cached partial hashes (full sha256 cached separately)
                h.update(f.read(1 << 20))
                h.update(str(os.path.getsize(self.path)).encode())
            self._hash = h.hexdigest()[:10]
        return self._hash


class ModelManager:
    def __init__(self, checkpoint_dirs: Optional[List[str]] = None,
                 vae_dirs: Optional[List[str]] = None,
                 embeddings_dir: Optional[str] = None):
        self.checkpoint_dirs = checkpoint_dirs or ["models/Stable-diffusion"]
        self.vae_dirs = vae_dirs or ["models/VAE"]
        self.embeddings_dir = embeddings_dir
        self._lock = threading.RLock()
        self._engine: Optional[DiffusionEngine] = None
        self._loading_key: Optional[tuple] = None
        self._aux_engines: Dict[str, DiffusionEngine] = {}  # refiner/hires
        self.checkpoints: Dict[str, CheckpointInfo] = {}
        self.refresh()
        # serve refiner/hires checkpoint lookups from the pipeline
        from ..pipeline import processing as _proc

        _proc.ENGINE_RESOLVER = self.resolve_aux

    def resolve_aux(self, name: str) -> DiffusionEngine:
        """Secondary engine for refiner/hires switches — kept ALONGSIDE the
        primary (reference swaps checkpoints in place, processing.py:1342;
        on TPU both stay resident and each pass uses its own compiled loop)."""
        info = self.find(name)
        if info is None:
            raise FileNotFoundError(f"checkpoint {name!r} not found")
        with self._lock:
            if info.path in self._aux_engines:
                return self._aux_engines[info.path]
        eng = load_engine(info.path, embeddings_dir=self.embeddings_dir)
        with self._lock:
            while len(self._aux_engines) >= 2:  # bound HBM: keep ≤2 aux engines
                self._aux_engines.pop(next(iter(self._aux_engines)))
            self._aux_engines[info.path] = eng
        return eng

    def refresh(self):
        with self._lock:
            self.checkpoints = {}
            for d in self.checkpoint_dirs:
                for ext in _EXTS:
                    for p in sorted(glob.glob(os.path.join(d, f"**/*{ext}"), recursive=True)):
                        info = CheckpointInfo(p)
                        self.checkpoints[info.name] = info

    def list_vaes(self) -> List[str]:
        out = []
        for d in self.vae_dirs:
            for ext in _EXTS:
                out += sorted(glob.glob(os.path.join(d, f"**/*{ext}"), recursive=True))
        return out

    def find(self, name_or_path: str) -> Optional[CheckpointInfo]:
        if name_or_path in self.checkpoints:
            return self.checkpoints[name_or_path]
        for info in self.checkpoints.values():
            if name_or_path in (info.path, info.title) or info.name.startswith(name_or_path):
                return info
        if os.path.exists(name_or_path):
            return CheckpointInfo(name_or_path)
        return None

    @property
    def engine(self) -> Optional[DiffusionEngine]:
        return self._engine

    def set_engine(self, engine: DiffusionEngine):
        with self._lock:
            self._engine = engine
            self._loading_key = ("external",)
        from .scripts import fire

        fire("model_loaded", engine)

    def load(self, name_or_path: str, vae: Optional[str] = None, **kwargs) -> DiffusionEngine:
        info = self.find(name_or_path)
        if info is None:
            raise FileNotFoundError(f"checkpoint {name_or_path!r} not found")
        key = (info.path, vae, tuple(sorted(kwargs.items())))
        with self._lock:
            if key == self._loading_key and self._engine is not None:
                return self._engine
            additional = {"vae": vae} if vae else None
            self._engine = load_engine(
                info.path, additional_modules=additional,
                embeddings_dir=self.embeddings_dir, **kwargs
            )
            # identity metadata for infotext (reference sd_models hash cache)
            self._engine.checkpoint_name = info.name
            self._engine.checkpoint_hash = info.short_hash()
            self._loading_key = key
        from .scripts import fire

        fire("model_loaded", self._engine)
        with self._lock:
            return self._engine

    def unload(self):
        with self._lock:
            self._engine = None
            self._loading_key = None
