"""PhotoMaker-style stacked-ID conditioning for SDXL — the net behind the
bundled photo_maker_v2 Space.

The reference's forge_space_photo_maker_v2 (extensions-builtin/
forge_space_photo_maker_v2/forge_app.py) drives the external TencentARC
`photomaker` pip package: insightface embeds + a CLIP-ViT ID encoder whose
output *replaces the trigger-word token* ("img") inside the encoded prompt,
so the identity rides the text conditioning instead of attention patches
(contrast IP-Adapter, pipeline/ipadapter.py). That package is a pip download
the reference fetches at install time; this port re-expresses the published
PhotoMaker algorithm (stacked ID embedding + FuseModule: concat → mlp1 +
residual → mlp2 → layer_norm) as tree-driven JAX with its own checkpoint ABI:

    id_encoder.vision_model.*            HF CLIPVision key space (reused
                                         backbone: models/clipvision.py)
    id_encoder.visual_projection.weight  [ctx_dim, vit_width]  pooled → ctx
    id_encoder.qformer.*                 optional (v2): perceiver resampler
                                         over a precomputed 512-d face embed
                                         (pipeline/ipadapter.py layers reused)
    id_encoder.fuse_module.mlp1.{0,2}    Linear(2·ctx → ctx), Linear(ctx→ctx)
    id_encoder.fuse_module.mlp2.{0,2}    same shapes, second stage
    id_encoder.fuse_module.layer_norm    final LayerNorm(ctx)

Face identity embeds follow the repo-wide insightface-free convention
(pipeline/ipadapter.py build_faceid_hooks): accept precomputed 512-d vectors,
or fall back to the pooled CLIP embedding of a detected face crop
(postprocessing/faces.py detect_faces).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

TRIGGER_WORD = "img"


def load_photomaker(path_or_sd) -> Dict[str, Any]:
    """Load a PhotoMaker checkpoint → nested params tree (id_encoder [+
    lora_weights, applied separately through core/patches.py)."""
    from ..core.state_dict import load_state_dict, transform_for_jax
    from ..core.tree import nest

    sd = path_or_sd if isinstance(path_or_sd, Mapping) else load_state_dict(path_or_sd)
    return nest({k: jnp.asarray(v) for k, v in transform_for_jax(dict(sd)).items()})


def _mlp(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """FuseModule MLP: Linear → GELU → Linear (torch Sequential keys 0/2)."""
    return nn.linear(nn.gelu(nn.linear(x, p["0"])), p["2"])


def encode_id_images(
    pm_params: Mapping[str, Any],
    clipvision_params: Optional[Mapping[str, Any]],
    pixels: jax.Array,                      # [N, 224, 224, 3] normalized
    face_embeds: Optional[jax.Array] = None,  # [N, 512] precomputed ids (v2)
) -> jax.Array:
    """ID images → stacked ID embeddings [N, T, ctx_dim].

    T = 1 for the projection path, or the qformer's query count when the
    checkpoint carries one and face embeds are supplied."""
    from ..models.clipvision import clip_vision_apply

    enc = pm_params["id_encoder"]
    vision = enc.get("vision_model")
    if vision is not None:
        _, pooled, _ = clip_vision_apply({"vision_model": vision}, pixels)
    else:
        _, pooled, _ = clip_vision_apply(clipvision_params, pixels)
    proj = enc["visual_projection"]["weight"]
    ctx = jnp.einsum("nd,od->no", pooled, proj.astype(pooled.dtype),
                     precision=nn._PRECISION)  # [N, ctx_dim]

    qf = enc.get("qformer")
    if qf is not None and face_embeds is not None:
        from .ipadapter import _perceiver_layers

        fe = nn.linear(face_embeds.astype(ctx.dtype), qf["proj_in"])
        lat = jnp.broadcast_to(
            qf["latents"].reshape((1,) + qf["latents"].shape[-2:]),
            (ctx.shape[0],) + qf["latents"].shape[-2:]).astype(ctx.dtype)
        # _perceiver_layers applies the tree's proj_out + norm_out → ctx_dim
        toks = _perceiver_layers(qf, lat, fe[:, None, :])
        return toks + ctx[:, None, :]  # id tokens around the visual anchor
    return ctx[:, None, :]


def fuse_id_embeds(
    pm_params: Mapping[str, Any],
    context: jax.Array,      # [B, L, D] encoded prompt
    id_embeds: jax.Array,    # [N, T, D] stacked ID embeddings
    trigger_pos: int,
) -> jax.Array:
    """Replace the trigger token with the fused stacked-ID embeddings.

    Published FuseModule semantics: for each ID token, fuse with the prompt
    embedding at the trigger position (concat → mlp1 + residual → mlp2 →
    layer_norm), then splice the N·T fused embeddings in place of the single
    trigger embedding, truncating to the original length."""
    fm = pm_params["id_encoder"]["fuse_module"]
    b, length, d = context.shape
    s = id_embeds.reshape(1, -1, d).astype(context.dtype)       # [1, N*T, D]
    s = jnp.broadcast_to(s, (b,) + s.shape[1:])
    anchor = context[:, trigger_pos:trigger_pos + 1]            # [B, 1, D]
    anchor = jnp.broadcast_to(anchor, s.shape)
    x = jnp.concatenate([anchor, s], axis=-1)
    x = _mlp(fm["mlp1"], x) + anchor
    x = _mlp(fm["mlp2"], x)
    fused = nn.layer_norm(x, fm["layer_norm"])                  # [B, N*T, D]
    out = jnp.concatenate(
        [context[:, :trigger_pos], fused, context[:, trigger_pos + 1:]], axis=1)
    return out[:, :length]


def find_trigger_position(engine, prompt: str) -> int:
    """Index of the trigger word's token inside the encoded 77-token chunk
    (BOS offset included). Raises if absent or repeated — the reference app
    enforces exactly one occurrence (forge_app.py:113-119)."""
    eng = engine.text_engines.get("clip_l") or next(iter(engine.text_engines.values()))
    ids = list(eng.tokenizer.ids(prompt))
    trig = list(eng.tokenizer.ids(TRIGGER_WORD))
    if len(trig) != 1:
        raise ValueError("trigger word must be a single token")
    hits = [i for i, t in enumerate(ids) if t == trig[0]]
    if not hits:
        raise ValueError(
            f"Cannot find the trigger word {TRIGGER_WORD!r} in the prompt")
    if len(hits) > 1:
        raise ValueError(
            f"Cannot use multiple trigger words {TRIGGER_WORD!r} in the prompt")
    return hits[0] + 1  # BOS


def id_pixels_from_images(images: List[np.ndarray]) -> np.ndarray:
    """uint8 face photos → normalized [N,224,224,3] CLIP-vision feed; crops
    to the detected face when a detector is available (reference: insightface
    detection, forge_app.py:25-26)."""
    from ..models.clipvision import preprocess
    from ..postprocessing.faces import detect_faces

    feeds = []
    for img in images:
        crop = img
        try:
            boxes = detect_faces(img)
        except Exception:
            boxes = []
        if boxes:
            x0, y0, x1, y1 = [int(v) for v in boxes[0]]
            pad = int(0.4 * max(x1 - x0, y1 - y0))
            x0, y0 = max(0, x0 - pad), max(0, y0 - pad)
            x1, y1 = min(img.shape[1], x1 + pad), min(img.shape[0], y1 + pad)
            if x1 > x0 and y1 > y0:
                crop = img[y0:y1, x0:x1]
        feeds.append(preprocess(crop))
    return np.concatenate(feeds, axis=0)


def build_cond_transform(
    engine,
    pm_params: Mapping[str, Any],
    prompt: str,
    id_images: Optional[List[np.ndarray]] = None,
    id_pixels: Optional[np.ndarray] = None,
    face_embeds: Optional[np.ndarray] = None,
    start_merge_ratio: float = 0.0,
):
    """→ Processing.cond_transform callable that splices the stacked-ID
    embeddings into the positive cond's context. start_merge_ratio mirrors
    the app's style_strength_ratio (identity kicks in after N% of steps is
    approximated here by linear blending of the fused context)."""
    pos = find_trigger_position(engine, prompt)
    if id_pixels is None:
        id_pixels = id_pixels_from_images(id_images or [])
    pix = jnp.asarray(id_pixels)
    fe = None if face_embeds is None else jnp.atleast_2d(
        jnp.asarray(face_embeds, jnp.float32))
    id_embeds = encode_id_images(pm_params, None, pix, face_embeds=fe)

    def transform(cond: Dict[str, Any]) -> Dict[str, Any]:
        ctx = cond["context"]
        fused = fuse_id_embeds(pm_params, ctx, id_embeds, pos)
        if start_merge_ratio > 0.0:
            fused = (1 - start_merge_ratio) * fused + start_merge_ratio * ctx
        return dict(cond, context=fused.astype(ctx.dtype))

    return transform
