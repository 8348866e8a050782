"""Diffusion engine: one loaded checkpoint assembled into runnable functions.

The analog of the reference's per-family ForgeDiffusionEngine classes
(backend/diffusion_engine/: sd15.py, sd20.py, sdxl.py, ...) — binds text
engines + VAE + UNet + σ-predictor behind the legacy API surface
(get_learned_conditioning / encode_first_stage / decode_first_stage), and owns
the jit cache keyed by tensor shapes (the analog of forge_loading_parameters
keying, modules/sd_models.py:473).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import latent_formats
from ..core.loader import LoadedCheckpoint, load_checkpoint_parts
from ..models import unet as unet_mod
from ..models import vae as vae_mod
from ..models.clip import ClipConfig
from ..ops import nn
from ..text.engine import ClassicTextEngine, TextEncoderOptions
from ..text.tokenizer import default_tokenizer
from ..text.textual_inversion import EmbeddingDatabase
from ..sampling import prediction as pred_mod


class DiffusionEngine:
    def __init__(
        self,
        loaded: LoadedCheckpoint,
        tokenizer=None,
        embeddings_dir: Optional[str] = None,
        compute_dtype=None,
    ):
        self.family = loaded.family
        self.loaded = loaded
        self.compute_dtype = compute_dtype or (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )
        self.latent_format = latent_formats.BY_FAMILY[loaded.family]
        self.unet_cfg = unet_mod.UNetConfig.for_family(loaded.family)
        self.tokenizer = tokenizer or default_tokenizer()

        self.embedding_db = EmbeddingDatabase(self.tokenizer)
        if embeddings_dir:
            self.embedding_db.load_dir(embeddings_dir)

        self.predictor = self._build_predictor()
        self.text_engines = self._build_text_engines()
        self._jit_cache: Dict[Any, Any] = {}
        self.clip_skip = 1

    # -- assembly -----------------------------------------------------------

    def _build_predictor(self):
        fam, pred = self.family, self.loaded.prediction
        if fam in ("sd15", "sd20", "sdxl", "sdxl_refiner"):
            return pred_mod.DiscretePrediction(prediction_type=pred)
        if fam == "sd3":
            return pred_mod.PredictionFlow(shift=3.0)
        if fam in ("flux", "chroma"):
            return pred_mod.PredictionFlux()
        raise ValueError(fam)

    def _build_text_engines(self):
        tes = self.loaded.text_encoders
        engines = {}
        if self.family in ("sd15",):
            engines["clip_l"] = ClassicTextEngine(
                tes["clip_l"], self.tokenizer, TextEncoderOptions(), self.embedding_db
            )
        elif self.family == "sd20":
            engines["clip_h"] = ClassicTextEngine(
                tes["clip_h"], self.tokenizer,
                TextEncoderOptions(), self.embedding_db,
                cfg=ClipConfig.for_width(1024),
            )
        elif self.family == "sdxl":
            engines["clip_l"] = ClassicTextEngine(
                tes["clip_l"], self.tokenizer,
                TextEncoderOptions(layer="hidden", layer_idx=-2, final_layer_norm=False),
                self.embedding_db,
            )
            engines["clip_g"] = ClassicTextEngine(
                tes["clip_g"], self.tokenizer,
                TextEncoderOptions(layer="hidden", layer_idx=-2, final_layer_norm=False,
                                   pooled_projection=True, which_embedding="g"),
                self.embedding_db,
                cfg=ClipConfig.for_width(1280),
            )
        elif self.family == "sdxl_refiner":
            engines["clip_g"] = ClassicTextEngine(
                tes["clip_g"], self.tokenizer,
                TextEncoderOptions(layer="hidden", layer_idx=-2, final_layer_norm=False,
                                   pooled_projection=True, which_embedding="g"),
                self.embedding_db,
                cfg=ClipConfig.for_width(1280),
            )
        return engines

    # -- conditioning -------------------------------------------------------

    def set_clip_skip(self, clip_skip: int):
        self.clip_skip = clip_skip
        for eng in self.text_engines.values():
            if eng.opts.layer == "last":
                eng.opts.clip_skip = clip_skip

    def get_learned_conditioning(
        self,
        prompts: List[str],
        width: int = 512,
        height: int = 512,
        is_negative: bool = False,
        max_chunks: Optional[int] = None,
        crop: Tuple[int, int] = (0, 0),
        original_size: Optional[Tuple[int, int]] = None,
        target_size: Optional[Tuple[int, int]] = None,
        aesthetic_score: float = 6.0,
    ) -> Dict[str, jax.Array]:
        """prompts → conditioning dict for the UNet ({context[, y]})."""
        if self.family in ("sd15", "sd20"):
            name = "clip_l" if self.family == "sd15" else "clip_h"
            z, _ = self.text_engines[name](prompts, max_chunks=max_chunks)
            return {"context": z.astype(self.compute_dtype)}

        if self.family == "sdxl":
            zl, _ = self.text_engines["clip_l"](prompts, max_chunks=max_chunks)
            zg, pooled_g = self.text_engines["clip_g"](prompts, max_chunks=max_chunks)
            context = jnp.concatenate([zl, zg], axis=-1)
            osize = original_size or (height, width)
            tsize = target_size or (height, width)
            sizes = [osize[0], osize[1], crop[0], crop[1], tsize[0], tsize[1]]
            embs = [nn.timestep_embedding(jnp.full((len(prompts),), s, jnp.float32), 256)
                    for s in sizes]
            y = jnp.concatenate([pooled_g] + embs, axis=-1)
            return {"context": context.astype(self.compute_dtype),
                    "y": y.astype(self.compute_dtype)}

        if self.family == "sdxl_refiner":
            zg, pooled_g = self.text_engines["clip_g"](prompts, max_chunks=max_chunks)
            osize = original_size or (height, width)
            score = 2.5 if is_negative else aesthetic_score
            sizes = [osize[0], osize[1], crop[0], crop[1], score]
            embs = [nn.timestep_embedding(jnp.full((len(prompts),), s, jnp.float32), 256)
                    for s in sizes]
            y = jnp.concatenate([pooled_g] + embs, axis=-1)
            return {"context": zg.astype(self.compute_dtype),
                    "y": y.astype(self.compute_dtype)}

        raise NotImplementedError(self.family)

    # -- nets ---------------------------------------------------------------

    def unet_apply_fn(self, hooks=None, control=None):
        cfg = self.unet_cfg

        def apply(params, x, t, context, y=None):
            return unet_mod.unet_apply(
                params, x, t, context, y=y, cfg=cfg, control=control, hooks=hooks
            )

        return apply

    # -- VAE ----------------------------------------------------------------

    def decode_first_stage(self, latent: jax.Array) -> jax.Array:
        """latent [B,h,w,C] (regulated space) → images [B,8h,8w,3] in [-1,1]."""
        key = ("vae_decode", latent.shape, latent.dtype.name)
        if key not in self._jit_cache:
            vp = self.loaded.vae

            @jax.jit
            def fn(z):
                z = jnp.asarray(self.latent_format.process_out(z.astype(jnp.float32)))
                return vae_mod.vae_decode(vp, z.astype(self.compute_dtype))

            self._jit_cache[key] = fn
        return self._jit_cache[key](latent)

    def encode_first_stage(self, images: jax.Array, noise: Optional[jax.Array] = None) -> jax.Array:
        """images [B,H,W,3] in [-1,1] → regulated latent [B,H/8,W/8,C]."""
        key = ("vae_encode", images.shape, images.dtype.name, noise is None)
        if key not in self._jit_cache:
            vp = self.loaded.vae

            @jax.jit
            def fn(x, nz):
                z = vae_mod.vae_encode(vp, x.astype(self.compute_dtype), noise=nz)
                return jnp.asarray(self.latent_format.process_in(z.astype(jnp.float32)))

            self._jit_cache[key] = fn
        return self._jit_cache[key](images, noise)


def load_engine(path_or_sd, **kwargs) -> DiffusionEngine:
    eng_kwargs = {k: kwargs.pop(k) for k in ("tokenizer", "embeddings_dir", "compute_dtype")
                  if k in kwargs}
    loaded = load_checkpoint_parts(path_or_sd, **kwargs)
    return DiffusionEngine(loaded, **eng_kwargs)
