"""Textual-inversion embedding database.

Loads .safetensors / .pt embeddings (reference
backend/text_processing/textual_inversion.py:111-227: webui `string_to_param`
format, bare-tensor format, and SDXL dual {clip_l, clip_g} format) and matches
them against token streams by their tokenized trigger name, so prompts splice
learned vectors into the CLIP input embedding sequence.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.state_dict import load_state_dict


class Embedding:
    def __init__(self, name: str, vectors: np.ndarray, vectors_g: Optional[np.ndarray] = None):
        self.name = name
        self.vectors = vectors  # [n_tokens, dim] for the primary (clip-l) encoder
        self.vectors_g = vectors_g  # SDXL second encoder, if present


def _extract(sd: dict) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    if "string_to_param" in sd:  # webui .pt format
        param = next(iter(sd["string_to_param"].values()))
        return np.asarray(param, dtype=np.float32), None
    if "clip_l" in sd or "clip_g" in sd:  # SDXL dual format
        l = np.asarray(sd["clip_l"], dtype=np.float32) if "clip_l" in sd else None
        g = np.asarray(sd["clip_g"], dtype=np.float32) if "clip_g" in sd else None
        return l, g
    if "emb_params" in sd:
        return np.asarray(sd["emb_params"], dtype=np.float32), None
    if len(sd) == 1:
        v = next(iter(sd.values()))
        if hasattr(v, "shape"):
            return np.asarray(v, dtype=np.float32), None
    return None, None


class EmbeddingDatabase:
    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.embeddings: Dict[str, Embedding] = {}
        self.by_first_id: Dict[int, List[Tuple[List[int], Embedding]]] = {}

    def register(self, name: str, vectors: np.ndarray, vectors_g=None):
        emb = Embedding(name, np.atleast_2d(vectors), vectors_g)
        self.embeddings[name] = emb
        ids = list(self.tokenizer.ids(name))
        if ids:
            self.by_first_id.setdefault(ids[0], []).append((ids, emb))
            # longest trigger first
            self.by_first_id[ids[0]].sort(key=lambda e: -len(e[0]))

    def load_dir(self, path: str):
        if not os.path.isdir(path):
            return
        for fname in sorted(os.listdir(path)):
            stem, ext = os.path.splitext(fname)
            if ext.lower() not in (".safetensors", ".pt", ".bin"):
                continue
            try:
                sd = load_state_dict(os.path.join(path, fname))
                vec_l, vec_g = _extract(sd)
                if vec_l is not None or vec_g is not None:
                    self.register(stem, vec_l if vec_l is not None else vec_g, vec_g)
            except Exception:
                continue

    def find(self, tokens: List[int], offset: int, which: str = "l"):
        """chunking.py embedding_lookup hook: match trigger token runs at
        `offset`; → (vectors, consumed_tokens) or None."""
        cands = self.by_first_id.get(tokens[offset])
        if not cands:
            return None
        for ids, emb in cands:
            if tokens[offset : offset + len(ids)] == ids:
                vec = emb.vectors_g if which == "g" and emb.vectors_g is not None else emb.vectors
                return vec, len(ids)
        return None
