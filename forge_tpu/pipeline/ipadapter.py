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

from ..core.state_dict import load_state_dict, transform_for_jax
from ..core.tree import nest
from ..ops import nn
from ..ops.attention import attention


def load_ip_adapter(path_or_sd) -> Dict[str, Any]:
    sd = load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else dict(path_or_sd)
    return nest(transform_for_jax(sd))


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


def _resampler(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """Perceiver resampler (IPAdapterPlus resampler.py): learned latents
    cross-attend penultimate CLIP-vision tokens."""
    lat = jnp.broadcast_to(p["latents"], (x.shape[0],) + p["latents"].shape[-2:]).astype(x.dtype)
    x = nn.linear(x, p["proj_in"])
    layers = p["layers"]
    dim = lat.shape[-1]
    heads = max(dim // 64, 1)
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


@dataclasses.dataclass
class IPAdapterState:
    params: Any
    ip_tokens: jax.Array  # [B, n, ctx]
    weight: float = 1.0

    def build_hooks(self) -> Dict[str, Any]:
        """→ UNet hook manifest entry. Counts attn2 layers in trace order to
        pick the matching to_k_ip/to_v_ip pair (the checkpoint numbers them
        1,3,5,... — odd indices are cross-attention)."""
        ip_layers = self.params["ip_adapter"]
        counter = {"i": 0}
        tokens = self.ip_tokens
        weight = self.weight

        def attn2_replace(q, k, v, extra):
            heads = extra["n_heads"]
            idx = counter["i"]
            counter["i"] += 1
            key = str(idx * 2 + 1)
            base = attention(q, k, v, heads=heads)
            if key not in ip_layers:
                return base
            lp = ip_layers[key]
            k_ip = nn.linear(tokens.astype(q.dtype), {"weight": lp["to_k_ip"]["weight"]})
            v_ip = nn.linear(tokens.astype(q.dtype), {"weight": lp["to_v_ip"]["weight"]})
            # broadcast across the CFG-concatenated batch
            if k_ip.shape[0] != q.shape[0]:
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
    return IPAdapterState(adapter_params, tokens, weight).build_hooks()
