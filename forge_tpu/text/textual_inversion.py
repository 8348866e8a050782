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
        self.version = 0  # bumped per mutation; cond-cache invalidation key

    def register(self, name: str, vectors: np.ndarray, vectors_g=None):
        self.version += 1
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


def create_embedding(engine, name: str, num_vectors: int = 1,
                     init_text: str = "*", overwrite: bool = False,
                     out_dir: str = "embeddings") -> str:
    """Create a textual-inversion embedding initialized from the token
    embeddings of `init_text` (reference modules/textual_inversion/
    textual_inversion.py:254 create_embedding + /sdapi/v1/create/embedding,
    api.py:782). The reference keeps only embedding CREATION from A1111 —
    training was stripped — so this is full parity. Saves the safetensors
    'emb_params' format the loader reads back; → saved path."""
    import re

    from ..core.save import save_safetensors

    safe = "".join(c for c in name if c.isalnum() or c in "._- ").strip()
    if not safe:
        raise ValueError(f"embedding name {name!r} has no legal characters")
    path = os.path.join(out_dir, safe + ".safetensors")
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(f"{path} exists (pass overwrite)")

    te = None
    for cand in ("clip_l", "clip", "open_clip_h", "open_clip_g"):
        if cand in getattr(engine, "text_engines", {}):
            te = engine.text_engines[cand]
            break
    if te is None:
        te = next(iter(engine.text_engines.values()))
    table = np.asarray(_token_table(te.params), np.float32)
    width = table.shape[1]
    vec = np.zeros((max(int(num_vectors), 1), width), np.float32)
    if init_text:
        ids = list(te.tokenizer.ids(init_text))
        if ids:
            emb = table[np.asarray(ids)]
            for i in range(vec.shape[0]):
                vec[i] = emb[i * len(ids) // vec.shape[0]]
    os.makedirs(out_dir, exist_ok=True)
    save_safetensors({"emb_params": vec}, path)
    return path


def _token_table(params) -> np.ndarray:
    """token-embedding weight from an HF-layout CLIP/open-clip tree."""
    node = params
    for key in ("text_model", "embeddings", "token_embedding", "weight"):
        if isinstance(node, dict) and key in node:
            node = node[key]
    if hasattr(node, "shape") and getattr(node, "ndim", 0) == 2:
        return node
    raise ValueError("text encoder has no token_embedding table")
