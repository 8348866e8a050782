"""CLIP interrogator: image → prompt-ish caption by ranking category terms.

Behavioral twin of the reference's InterrogateModels CLIP half
(modules/interrogate.py:48-200): embed the image with the CLIP vision tower,
embed candidate texts with the CLIP text tower, rank by cosine similarity,
and assemble "medium, artist, flavor, …" from the top matches per category.
The BLIP caption the reference prepends (interrogate.py:184) leads the
result when a BLIP checkpoint + vocab.txt sit under models/BLIP
(models/blip.py greedy captioner); otherwise the top "mediums" term seeds
the caption instead.

Category word lists = ``models/interrogate/*.txt`` (same layout as the
reference's interrogate/ directory: artists.txt, flavors.txt, mediums.txt,
movements.txt — one term per line). CLIP weights: any full CLIP checkpoint
(text + visual towers, e.g. openai ViT-L/14) under ``models/interrogate/``
or ``models/clip_interrogator/``.
"""

from __future__ import annotations

import functools
import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

_CATEGORY_ORDER = ("mediums", "artists", "movements", "flavors")


def load_categories(dirname: str = "models/interrogate") -> Dict[str, List[str]]:
    cats = {}
    for path in sorted(glob.glob(os.path.join(dirname, "*.txt"))):
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path, encoding="utf8") as f:
            terms = [ln.strip() for ln in f if ln.strip()]
        if name == "artists":
            terms = [f"by {t}" for t in terms]
        if terms:
            cats[name] = terms
    return cats


class ClipInterrogator:
    def __init__(self, model_dirs=("models/interrogate", "models/clip_interrogator"),
                 params=None, tokenizer=None):
        self.model_dirs = model_dirs
        self._params = params
        self._tokenizer = tokenizer
        self._text_cache: Dict[str, np.ndarray] = {}

    def _find_checkpoint(self) -> Optional[str]:
        for d in self.model_dirs:
            for ext in ("*.safetensors", "*.pt", "*.ckpt", "*.bin"):
                hits = sorted(glob.glob(os.path.join(d, ext)))
                if hits:
                    return hits[0]
        return None

    @property
    def available(self) -> bool:
        return self._params is not None or self._find_checkpoint() is not None

    def _load(self):
        if self._params is None:
            from ..core.state_dict import load_state_dict, transform_for_jax
            from ..core.tree import nest

            path = self._find_checkpoint()
            if path is None:
                raise FileNotFoundError("no CLIP checkpoint for interrogation")
            sd = transform_for_jax(load_state_dict(path))
            import jax.numpy as jnp

            self._params = nest({k: jnp.asarray(v) for k, v in sd.items()})
        if self._tokenizer is None:
            from ..text.tokenizer import default_tokenizer

            self._tokenizer = default_tokenizer()
        return self._params

    # -- embedding -----------------------------------------------------------

    def image_embed(self, image: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from ..models.clipvision import clip_vision_apply, preprocess

        params = self._load()
        x = jnp.asarray(preprocess(image))
        projected, _, _ = clip_vision_apply(params, x)
        v = np.asarray(projected, np.float32)[0]
        return v / (np.linalg.norm(v) + 1e-8)

    def text_embeds(self, texts: List[str]) -> np.ndarray:
        import jax.numpy as jnp

        from ..models.clip import clip_pooled_projection, clip_text_apply

        params = self._load()
        missing = [t for t in texts if t not in self._text_cache]
        for start in range(0, len(missing), 256):
            chunk = missing[start:start + 256]
            ids = np.full((len(chunk), 77), 49407, np.int32)
            for i, t in enumerate(chunk):
                toks = [49406] + list(self._tokenizer.ids(t))[:75] + [49407]
                ids[i, :len(toks)] = toks
            _, _, pooled = clip_text_apply(params, jnp.asarray(ids))
            proj = np.asarray(clip_pooled_projection(params, pooled), np.float32)
            proj /= np.linalg.norm(proj, axis=-1, keepdims=True) + 1e-8
            for t, v in zip(chunk, proj):
                self._text_cache[t] = v
        return np.stack([self._text_cache[t] for t in texts])

    def rank(self, image_embed: np.ndarray, texts: List[str],
             top_count: int = 1) -> List[Tuple[str, float]]:
        """Cosine ranking (reference interrogate.py:136-158 rank)."""
        if not texts:
            return []
        sims = self.text_embeds(texts) @ image_embed
        order = np.argsort(sims)[::-1][:top_count]
        # reference scales similarity ×100 into a percent-ish confidence
        return [(texts[i], float(sims[i] * 100)) for i in order]

    def interrogate(self, image: np.ndarray,
                    categories: Optional[Dict[str, List[str]]] = None) -> str:
        """→ caption string (reference interrogate.py:160-200)."""
        from ..runtime.options import opts

        try:
            include_ranks = bool(opts.get("interrogate_return_ranks"))
        except KeyError:
            include_ranks = False
        threshold = 0.0
        cats = categories if categories is not None else load_categories()
        emb = self.image_embed(image)
        parts: List[str] = []
        # BLIP caption leads when the generative model is installed
        # (reference interrogate.py:184 generate_caption → caption prefix)
        from ..models.blip import get_blip

        blip = get_blip()
        if blip.available:
            try:
                def oi(key, default):
                    try:
                        return int(opts.get(key))
                    except KeyError:
                        return default

                parts.append(blip.caption(
                    image, max_length=max(oi("interrogate_clip_max_length", 48),
                                          oi("interrogate_clip_min_length", 24))))
            except Exception as e:
                print(f"BLIP caption failed: {e}")
        try:
            dict_limit = int(opts.get("interrogate_clip_dict_limit"))
        except KeyError:
            dict_limit = 0
        skip = set()
        try:
            skip = {x.strip() for x in
                    str(opts.get("interrogate_clip_skip_categories") or "").split(",")
                    if x.strip()}
        except KeyError:
            pass
        for name in _CATEGORY_ORDER:
            terms = cats.get(name)
            if not terms or name in skip:
                continue
            if dict_limit:
                terms = terms[:dict_limit]
            for term, score in self.rank(emb, terms):
                if score >= threshold:
                    parts.append(f"({term}:{score / 100:.3f})" if include_ranks else term)
        for name, terms in cats.items():
            if name not in _CATEGORY_ORDER and terms and name not in skip:
                if dict_limit:
                    terms = terms[:dict_limit]
                for term, score in self.rank(emb, terms):
                    parts.append(f"({term}:{score / 100:.3f})" if include_ranks else term)
        return ", ".join(parts) if parts else "<no categories installed>"


@functools.lru_cache(maxsize=1)
def get_interrogator() -> ClipInterrogator:
    return ClipInterrogator()
