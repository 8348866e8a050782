"""Marigold diffusion-based depth preprocessor in JAX.

Re-implementation of the reference's marigold extension (extensions-builtin/
forge_preprocessor_marigold/marigold/model/marigold_pipeline.py): a
latent-diffusion monocular depth estimator — the SD2 VAE encodes the RGB
image, a fine-tuned SD2 UNet with an 8-channel conv_in denoises a depth
latent conditioned on the concatenated RGB latent (that channel order is
load-bearing, marigold_pipeline.py:254-256) and an empty-prompt CLIP
embedding, and the VAE decoder's channel-mean is the depth map
(stacked_depth_AE.py:49-53).

TPU-native re-expression: the whole DDIM loop is one `lax.scan` program over
the existing tree-driven UNet/VAE models (same vehicle as the GeoWizard
Space, which shares the 8-channel-concat mechanism). The empty text embed is
computed once from the bundled text encoder ("do_not_pad" tokenization → the
2-token [BOS, EOS] sequence, marigold_pipeline.py:303-313).

Checkpoint: one safetensors with `unet.` / `vae.` / `text_encoder.` prefixes
under models/marigold (the repo's single-file convention for diffusers
multi-folder models). The DDIM schedule follows the SD2 scheduler config the
reference loads (scaled_linear betas, leading spacing, steps_offset 1,
set_alpha_to_one false); prediction type comes from checkpoint metadata
(`prediction_type`), defaulting to epsilon.
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Optional

import numpy as np

LATENT_SCALE = 0.18215
_BOS, _EOS = 49406, 49407


class MarigoldPipeline:
    def __init__(self, unet_params, vae_params, text_params=None,
                 prediction_type: str = "epsilon"):
        import jax

        from ..core.state_dict import as_device_tree

        self.unet = as_device_tree(unet_params)
        self.vae = as_device_tree(vae_params)
        self.prediction_type = prediction_type
        self.empty_embed = self._empty_text_embed(text_params)
        self._infer = jax.jit(self._infer_fn, static_argnames=("steps",))

    @staticmethod
    def _empty_text_embed(text_params):
        import jax.numpy as jnp

        if text_params is None:
            return None
        from ..models.clip import clip_text_apply

        tokens = jnp.asarray([[_BOS, _EOS]], jnp.int32)
        final, _, _ = clip_text_apply(text_params, tokens)
        return final  # [1, 2, width]

    @classmethod
    def from_file(cls, path: str):
        from ..core.state_dict import (diffusers_unet_to_ldm, filter_prefix,
                                       load_state_dict, transform_for_jax)
        from ..core.tree import nest

        sd = load_state_dict(path)
        meta = sd.pop("__metadata__", {}) if isinstance(
            sd.get("__metadata__"), dict) else {}
        unet_sd = filter_prefix(sd, "unet.")
        if any(k.startswith("down_blocks.") for k in unet_sd):
            unet_sd = diffusers_unet_to_ldm(unet_sd)
        vae_sd = filter_prefix(sd, "vae.")
        text_sd = filter_prefix(sd, "text_encoder.")

        def tree(s):
            import jax.numpy as jnp

            return nest({k: jnp.asarray(v)
                         for k, v in transform_for_jax(s).items()})

        return cls(tree(unet_sd), tree(vae_sd),
                   tree(text_sd) if text_sd else None,
                   prediction_type=str(meta.get("prediction_type", "epsilon")))

    def _infer_fn(self, unet, vae, rgb, noise, context, steps):
        """rgb [1,H,W,3] in [-1,1], noise [1,h,w,4] → depth [H,W] in [-1,1]."""
        import jax
        import jax.numpy as jnp

        from ..models.unet import unet_apply
        from ..models.vae import vae_decode, vae_encode
        from ..sampling.prediction import make_beta_schedule

        rgb_latent = vae_encode(vae, rgb) * LATENT_SCALE

        alphas_cumprod = jnp.asarray(
            np.cumprod(1.0 - make_beta_schedule(1000), axis=0), jnp.float32)
        # DDIMScheduler "leading" spacing with steps_offset=1 (the SD2
        # scheduler config the reference loads via from_pretrained)
        ratio = 1000 // steps
        ts = (jnp.arange(steps, dtype=jnp.int32) * ratio)[::-1] + 1
        ts_prev = ts - ratio
        # set_alpha_to_one=False → final alpha is alphas_cumprod[0]
        final_alpha = alphas_cumprod[0]

        def step(depth_latent, t_pair):
            t, t_prev = t_pair
            a_t = alphas_cumprod[t]
            a_prev = jnp.where(t_prev >= 0,
                               alphas_cumprod[jnp.maximum(t_prev, 0)],
                               final_alpha)
            x_in = jnp.concatenate([rgb_latent, depth_latent], axis=-1)
            pred = unet_apply(unet, x_in, jnp.full((1,), t, jnp.float32),
                              context)
            if self.prediction_type == "v_prediction":
                x0 = (jnp.sqrt(a_t) * depth_latent
                      - jnp.sqrt(1.0 - a_t) * pred)
                eps = (jnp.sqrt(a_t) * pred
                       + jnp.sqrt(1.0 - a_t) * depth_latent)
            else:
                x0 = (depth_latent - jnp.sqrt(1.0 - a_t) * pred) / jnp.sqrt(a_t)
                eps = pred
            return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps, None

        depth_latent, _ = jax.lax.scan(step, noise, (ts, ts_prev))
        decoded = vae_decode(vae, depth_latent / LATENT_SCALE)  # [1,H,W,3]
        return jnp.clip(decoded[0].mean(-1), -1.0, 1.0)

    def run(self, img: np.ndarray, steps: int = 20, seed: int = 0) -> np.ndarray:
        """uint8 [H,W,3] (H,W % 64 == 0) → depth map uint8 [H,W,3]
        (preprocessor_marigold.py:59-64: depth = 0.5 − pred·0.5)."""
        import jax.numpy as jnp

        h, w = img.shape[:2]
        rgb = jnp.asarray(img, jnp.float32)[None] / 127.5 - 1.0
        rng = np.random.default_rng(seed)
        noise = jnp.asarray(rng.standard_normal((1, h // 8, w // 8, 4)),
                            jnp.float32)
        context = self.empty_embed
        if context is None:
            raise RuntimeError("marigold checkpoint has no text_encoder.*")
        depth = np.asarray(
            self._infer(self.unet, self.vae, rgb, noise, context,
                        steps=int(steps)), np.float32)
        depth = 0.5 - depth * 0.5
        out = (depth * 255.0).clip(0, 255).astype(np.uint8)
        return np.repeat(out[..., None], 3, axis=2)


class MarigoldDetector:
    def __init__(self, model_dir: str = "models/marigold"):
        self.model_dir = model_dir
        self.pipe: Optional[MarigoldPipeline] = None

    def _candidates(self):
        if not os.path.isdir(self.model_dir):
            return []
        return [f for f in sorted(os.listdir(self.model_dir))
                if f.endswith((".safetensors", ".sft", ".pt"))]

    def load(self):
        if self.pipe is not None:
            return
        cands = self._candidates()
        if not cands:
            return
        self.pipe = MarigoldPipeline.from_file(
            os.path.join(self.model_dir, cands[0]))

    def detect(self, img: np.ndarray, steps: int = 20, seed: int = 0) -> np.ndarray:
        import cv2

        self.load()
        if self.pipe is None:
            raise RuntimeError(f"no Marigold checkpoint under {self.model_dir}")
        h, w = img.shape[:2]
        # latent-friendly working size (multiple of 64), as the reference's
        # resize_image_with_pad does before the pipeline call
        nh = max(64, int(round(h / 64)) * 64)
        nw = max(64, int(round(w / 64)) * 64)
        feed = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA) \
            if (nh, nw) != (h, w) else img
        out = self.pipe.run(feed, steps=steps, seed=seed)
        if (nh, nw) != (h, w):
            out = cv2.resize(out, (w, h), interpolation=cv2.INTER_LINEAR)
        return out


_DETECTOR: Optional[MarigoldDetector] = None


def get_marigold() -> MarigoldDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = MarigoldDetector()
    return _DETECTOR


def _depth_marigold(img, res, a, b):
    from .cv import resize_image

    out = get_marigold().detect(resize_image(img, res))
    return np.asarray(out, np.float32) / 255.0


def _register():
    from . import Preprocessor, register

    register(Preprocessor("depth_marigold", _depth_marigold, tags=("Depth",),
                          needs_weights=True))


_register()
