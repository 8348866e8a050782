"""IP-Adapter: image-prompt conditioning via cross-attention injection.

Behavioral twin of the reference's sd_forge_ipadapter extension
(lib_ipadapter/IPAdapterPlus.py:161-170,741-782): CLIP-vision embeds project
to a handful of context tokens (simple linear proj or the perceiver
Resampler for -plus models); every cross-attention adds
`weight · attention(q, k_ip, v_ip)` using per-layer to_k_ip/to_v_ip weights.

TPU-native shape: the per-layer IP keys/values are precomputed once per
generation (the image doesn't change across steps) and injected through the
UNet hook manifest as an `attn2_replace_all` closure that counts attention
layers in trace order — compile-time composition, no module mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state_dict import as_device_tree, load_state_dict, transform_for_jax
from ..core.tree import nest
from ..ops import nn
from ..ops.attention import attention


def load_ip_adapter(path_or_sd) -> Dict[str, Any]:
    sd = load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else dict(path_or_sd)
    return as_device_tree(nest(transform_for_jax(sd)))


def project_image_embeds(params: Mapping[str, Any], clip_embed: jax.Array) -> jax.Array:
    """image_proj: clip embed → IP context tokens [B, n_tokens, ctx_dim]."""
    proj = params["image_proj"]
    if "proj" in proj:  # simple (non-plus): Linear → reshape 4 tokens → LN
        w = proj["proj"]["weight"]
        out = nn.linear(clip_embed, proj["proj"])
        n_tokens = out.shape[-1] // proj["norm"]["weight"].shape[0]
        out = out.reshape(out.shape[0], n_tokens, -1)
        return nn.layer_norm(out, proj["norm"])
    if "latents" in proj:  # Resampler (plus models)
        return _resampler(proj, clip_embed)
    raise ValueError("unknown image_proj layout")


def _perceiver_layers(p: Mapping[str, Any], lat: jax.Array, x: jax.Array) -> jax.Array:
    """Shared perceiver loop: `lat` queries cross-attend cat(x, lat)."""
    layers = p["layers"]
    heads = max(lat.shape[-1] // 64, 1)
    for i in range(len(layers)):
        lp = layers[str(i)]
        attn_p, ff_p = lp["0"], lp["1"]
        ln_x = nn.layer_norm(x, attn_p["norm1"])
        ln_l = nn.layer_norm(lat, attn_p["norm2"])
        kv_in = jnp.concatenate([ln_x, ln_l], axis=1)
        q = nn.linear(ln_l, {"weight": attn_p["to_q"]["weight"]})
        kv = nn.linear(kv_in, {"weight": attn_p["to_kv"]["weight"]})
        k, v = jnp.split(kv, 2, axis=-1)
        out = attention(q, k, v, heads=heads, impl="xla")
        lat = lat + nn.linear(out, {"weight": attn_p["to_out"]["weight"]})
        h = nn.layer_norm(lat, ff_p["0"])
        h = nn.linear(h, ff_p["1"])
        h = nn.gelu(h)
        lat = lat + nn.linear(h, ff_p["3"])
    lat = nn.linear(lat, p["proj_out"])
    return nn.layer_norm(lat, p["norm_out"])


def _resampler(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """Perceiver resampler (IPAdapterPlus resampler.py): learned latents
    cross-attend penultimate CLIP-vision tokens."""
    lat = jnp.broadcast_to(p["latents"], (x.shape[0],) + p["latents"].shape[-2:]).astype(x.dtype)
    x = nn.linear(x, p["proj_in"])
    return _perceiver_layers(p, lat, x)


def project_faceid_embeds(
    params: Mapping[str, Any],
    face_embed: jax.Array,   # [B, 512] insightface id embedding
    clip_embed: Optional[jax.Array] = None,  # [B, L, 1280] penultimate (plus)
    scale: float = 1.0,
    shortcut: bool = False,  # faceid_v2
) -> jax.Array:
    """FaceID projection (reference IPAdapterPlus.py:80 MLPProjModelFaceId /
    :101 ProjModelFaceIdPlus): id embed → MLP → n tokens; the plus variant
    refines them with a face perceiver over CLIP-vision tokens."""
    proj = params["image_proj"]
    h = nn.linear(face_embed, proj["proj"]["0"])
    h = nn.gelu(h)
    h = nn.linear(h, proj["proj"]["2"])
    ctx = proj["norm"]["weight"].shape[0]
    x = nn.layer_norm(h.reshape(h.shape[0], -1, ctx), proj["norm"])
    if "perceiver_resampler" in proj and clip_embed is not None:
        pr = proj["perceiver_resampler"]
        out = _perceiver_layers(pr, x, nn.linear(clip_embed, pr["proj_in"]))
        return x + scale * out if shortcut else out
    return x


def is_faceid_adapter(params: Mapping[str, Any]) -> bool:
    """FaceID checkpoints carry attn loras in ip_adapter (detection only —
    the reference never applies them, IPAdapterPlus.py:607) and a Sequential
    MLP image_proj."""
    proj = params.get("image_proj", {})
    return "proj" in proj and isinstance(proj["proj"], Mapping) and "0" in proj["proj"]


@dataclasses.dataclass
class IPAdapterState:
    params: Any
    ip_tokens: jax.Array  # [B, n, ctx] (cond)
    weight: float = 1.0
    # uncond tokens (zeroed-image projection, reference get_image_embeds):
    # applied to the uncond half of the CFG batch; None tiles cond everywhere
    uncond_tokens: Optional[jax.Array] = None

    def build_hooks(self) -> Dict[str, Any]:
        """→ UNet hook manifest entry. Counts attn2 layers in trace order to
        pick the matching to_k_ip/to_v_ip pair (regular checkpoints number
        them 1,3,5,… — odd indices are cross-attention; FaceID checkpoints
        number cross-attention layers sequentially 0,1,2,…)."""
        ip_layers = self.params["ip_adapter"]
        sequential = "0" in ip_layers
        counter = {"i": 0}
        tokens = self.ip_tokens
        uncond = self.uncond_tokens
        weight = self.weight

        def attn2_replace(q, k, v, extra):
            heads = extra["n_heads"]
            idx = counter["i"]
            counter["i"] += 1
            key = str(idx if sequential else idx * 2 + 1)
            base = attention(q, k, v, heads=heads)
            if key not in ip_layers:
                return base
            lp = ip_layers[key]
            if lp["to_k_ip"]["weight"].shape[0] != q.shape[-1]:
                raise ValueError(
                    f"IP-Adapter layer {key}: to_k_ip out-dim "
                    f"{lp['to_k_ip']['weight'].shape[0]} != attention width "
                    f"{q.shape[-1]} — adapter was trained for a different "
                    f"model family (e.g. an SD1.5 adapter on SDXL)")

            def kv(toks):
                k_ip = nn.linear(toks.astype(q.dtype), {"weight": lp["to_k_ip"]["weight"]})
                v_ip = nn.linear(toks.astype(q.dtype), {"weight": lp["to_v_ip"]["weight"]})
                return k_ip, v_ip

            k_ip, v_ip = kv(tokens)
            if uncond is not None and q.shape[0] == 2 * tokens.shape[0]:
                # CFG batch layout is [cond…, uncond…] (sampling/cfg.py)
                k_un, v_un = kv(uncond)
                k_ip = jnp.concatenate([k_ip, k_un], axis=0)
                v_ip = jnp.concatenate([v_ip, v_un], axis=0)
            elif k_ip.shape[0] != q.shape[0]:
                reps = q.shape[0] // k_ip.shape[0]
                k_ip = jnp.tile(k_ip, (reps, 1, 1))
                v_ip = jnp.tile(v_ip, (reps, 1, 1))
            return base + weight * attention(q, k_ip, v_ip, heads=heads)

        return {"attn2_replace_all": attn2_replace}


def build_ip_adapter_hooks(
    adapter_params: Any,
    clip_vision_params: Any,
    image: np.ndarray,
    weight: float = 1.0,
    batch_size: int = 1,
    plus: Optional[bool] = None,
) -> Dict[str, Any]:
    """One-call setup: encode the reference image, project to IP tokens,
    return the hook manifest for Processing.unet_hooks."""
    from ..models.clipvision import clip_vision_apply, preprocess

    pixels = jnp.asarray(preprocess(image))
    projected, pooled, penultimate = clip_vision_apply(clip_vision_params, pixels)
    use_plus = plus if plus is not None else ("latents" in adapter_params.get("image_proj", {}))
    embed = penultimate if use_plus else projected
    tokens = project_image_embeds(adapter_params, embed)
    tokens = jnp.broadcast_to(tokens, (batch_size,) + tokens.shape[1:])
    # zeroed-image uncond projection (reference get_image_embeds zeroed pair)
    un = project_image_embeds(adapter_params, jnp.zeros_like(embed))
    un = jnp.broadcast_to(un, (batch_size,) + un.shape[1:])
    return IPAdapterState(adapter_params, tokens, weight,
                          uncond_tokens=un).build_hooks()


def build_faceid_hooks(
    adapter_params: Any,
    face_embed: np.ndarray,  # [512] or [B,512] precomputed insightface embed
    clip_vision_params: Any = None,
    image: Optional[np.ndarray] = None,
    weight: float = 1.0,
    batch_size: int = 1,
    faceid_v2: bool = False,
    weight_v2: float = 1.0,
) -> Dict[str, Any]:
    """FaceID / FaceID-Plus hook builder. The face id embedding arrives
    PRECOMPUTED (API `face_embeds` field) — the insightface detector is an
    optional external step, mirroring the reference's cached-embeds path
    (IPAdapterPlus.py embeds input). FaceID-Plus additionally needs the
    CLIP-vision penultimate tokens of the face crop."""
    fe = jnp.asarray(face_embed, jnp.float32)
    if fe.ndim == 1:
        fe = fe[None]
    clip_embed = None
    proj = adapter_params.get("image_proj", {})
    if "perceiver_resampler" in proj:
        if clip_vision_params is None or image is None:
            raise ValueError("FaceID-Plus needs clip_vision weights + face image")
        from ..models.clipvision import clip_vision_apply, preprocess

        _, _, clip_embed = clip_vision_apply(clip_vision_params,
                                             jnp.asarray(preprocess(image)))
    tokens = project_faceid_embeds(adapter_params, fe, clip_embed,
                                   scale=weight_v2, shortcut=faceid_v2)
    un = project_faceid_embeds(adapter_params, jnp.zeros_like(fe),
                               jnp.zeros_like(clip_embed) if clip_embed is not None else None,
                               scale=weight_v2, shortcut=faceid_v2)
    tokens = jnp.broadcast_to(tokens, (batch_size,) + tokens.shape[1:])
    un = jnp.broadcast_to(un, (batch_size,) + un.shape[1:])
    return IPAdapterState(adapter_params, tokens, weight,
                          uncond_tokens=un).build_hooks()



def _decode_unit_image(img):
    """base64 (optionally data-URL) → RGB array; arrays pass through."""
    if isinstance(img, str):
        import base64
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(
            base64.b64decode(img.split(",", 1)[-1]))).convert("RGB"))
    return img

def attach(p, unit: Mapping[str, Any]) -> None:
    """alwayson-script entry (API payload → Processing). Fields:
    adapter_path, weight, and ONE of: image (b64/array, regular/plus with
    clip_vision_path), face_embeds (FaceID — precomputed insightface vector,
    optionally + image/clip_vision_path for -Plus), instant_id: true with
    face_embeds (+ optional controlnet coupling attached separately)."""
    params = load_ip_adapter(unit["adapter_path"])
    weight = float(unit.get("weight", 1.0))
    batch = getattr(p, "batch_size", 1)
    face = unit.get("face_embeds")
    if unit.get("instant_id") and face is not None:
        hooks, _ = build_instantid(params, np.asarray(face, np.float32),
                                   weight=weight, batch_size=batch)
    elif face is not None or is_faceid_adapter(params):
        if face is None:
            raise ValueError("FaceID adapter needs precomputed face_embeds")
        cv = (load_ip_adapter(unit["clip_vision_path"])
              if unit.get("clip_vision_path") else None)
        img = _decode_unit_image(unit.get("image"))
        hooks = build_faceid_hooks(params, np.asarray(face, np.float32),
                                   clip_vision_params=cv, image=img,
                                   weight=weight, batch_size=batch,
                                   faceid_v2=bool(unit.get("faceid_v2")),
                                   weight_v2=float(unit.get("weight_v2", 1.0)))
    else:
        img = _decode_unit_image(unit.get("image"))
        cv = load_ip_adapter(unit["clip_vision_path"])
        hooks = build_ip_adapter_hooks(params, cv, img, weight=weight,
                                       batch_size=batch)
    p.unet_hooks = {**(p.unet_hooks or {}), **hooks}


def build_instantid(
    adapter_params: Any,
    face_embed: np.ndarray,  # [512] antelopev2 id embedding (precomputed)
    controlnet_state=None,   # models.controlnet.ControlNetState (keypoint CN)
    weight: float = 1.0,
    batch_size: int = 1,
):
    """InstantID (reference IPAdapterPlus.py:341 init_proj_instantid +
    forge_ipadapter.py instant_id path): the face embed runs through a
    plus-style resampler → 16 tokens; those tokens (a) inject as IP k/v in
    the UNet and (b) REPLACE the coupled keypoint-ControlNet's cross-attn
    context (the reference's controlnet_conditioning_modifier swaps
    c_crossattn for the image embeds). → (unet_hooks, controlnet_state)."""
    fe = jnp.asarray(face_embed, jnp.float32)
    if fe.ndim == 1:
        fe = fe[None]
    fe = fe[:, None, :]  # [B, 1, 512] token sequence for the resampler
    cond = _resampler(adapter_params["image_proj"], fe)
    uncond = _resampler(adapter_params["image_proj"], jnp.zeros_like(fe))
    cond = jnp.broadcast_to(cond, (batch_size,) + cond.shape[1:])
    uncond = jnp.broadcast_to(uncond, (batch_size,) + uncond.shape[1:])
    hooks = IPAdapterState(adapter_params, cond, weight,
                           uncond_tokens=uncond).build_hooks()
    if controlnet_state is not None:
        import dataclasses as _dc

        controlnet_state = _dc.replace(
            controlnet_state,
            context_override=jnp.concatenate([cond, uncond], axis=0))
    return hooks, controlnet_state
