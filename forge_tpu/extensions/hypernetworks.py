"""Legacy A1111 hypernetworks: per-context-dim MLPs on attention k/v inputs.

Behavioral twin of modules/hypernetworks/hypernetwork.py (the loader + the
apply path that Forge keeps vestigially): a .pt checkpoint carries, for each
cross-attention context width (320/640/768/1024/1280…), a PAIR of small
residual MLPs; at every attn2, k projects from mlp_k(context) and v from
mlp_v(context):
    context' = context + mlp(context) · strength

Applied through the ``attn2_context_patch`` hook slot (pre-projection —
post-projection patches can't express this, which is why the slot exists).
Both checkpoint layouts load: old ("linear1.weight"/"linear2.weight") and
new ("linear.0.weight", …, with optional LayerNorm interleave).

Note on jit plumbing: these param trees are CLOSED OVER by the compiled
denoise loop rather than passed as jit arguments. The 28 ms/dispatch
closure-tree cost (PERF.md) is paid once per GENERATION here — the whole
sampler loop is one dispatch — not per step, so explicit-arg plumbing
through every hook slot isn't worth the ABI churn. Trees must still be
device-resident (as_device_tree) to avoid HLO constant-folding.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ACTS = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "elu": jax.nn.elu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}


def _parse_module(sd: Mapping[str, np.ndarray]) -> List[Dict[str, Any]]:
    """One HypernetworkModule state dict → ordered layer list. Weights go to
    device here: the layers are traced into the denoise jit closure, and
    numpy leaves would constant-fold into the HLO."""
    def _dev(v):
        return jnp.asarray(np.asarray(v, np.float32))

    layers: List[Dict[str, Any]] = []
    if "linear1.weight" in sd:  # old layout: exactly two linears
        for name in ("linear1", "linear2"):
            layers.append({"kind": "linear",
                           "weight": _dev(sd[f"{name}.weight"]),
                           "bias": _dev(sd.get(f"{name}.bias", 0))})
        return layers
    idx = 0
    while f"linear.{idx}.weight" in sd:
        w = _dev(sd[f"linear.{idx}.weight"])
        b = sd.get(f"linear.{idx}.bias")
        if w.ndim == 2:
            layers.append({"kind": "linear", "weight": w,
                           "bias": _dev(b) if b is not None else None})
        else:  # 1-D weight → LayerNorm
            layers.append({"kind": "layernorm", "weight": w,
                           "bias": _dev(b)})
        idx += 1
    return layers


def _module_apply(layers, x: jax.Array, activation: str) -> jax.Array:
    act = _ACTS.get(activation.lower(), _ACTS["linear"])
    h = x
    n_linear = sum(1 for l in layers if l["kind"] == "linear")
    seen = 0
    for layer in layers:
        if layer["kind"] == "linear":
            h = h @ jnp.asarray(layer["weight"]).T.astype(h.dtype)
            if layer["bias"] is not None:
                h = h + jnp.asarray(layer["bias"]).astype(h.dtype)
            seen += 1
            if seen < n_linear:  # activation between linears, not after last
                h = act(h)
        else:
            w, b = jnp.asarray(layer["weight"]), jnp.asarray(layer["bias"])
            mu = h.mean(-1, keepdims=True)
            var = h.var(-1, keepdims=True)
            h = (h - mu) / jnp.sqrt(var + 1e-5) * w.astype(h.dtype) + b.astype(h.dtype)
    return x + h  # residual (hypernetwork.py HypernetworkModule.forward)


class Hypernetwork:
    def __init__(self, modules: Dict[int, Tuple[list, list]],
                 activation: str = "linear", name: str = "hypernetwork"):
        self.modules = modules  # {context_dim: (layers_k, layers_v)}
        self.activation = activation
        self.name = name

    def context_patch(self, strength: float = 1.0):
        modules = self.modules
        activation = self.activation

        def patch(ctx_k, ctx_v, extra):
            dim = ctx_k.shape[-1]
            if dim not in modules:
                return ctx_k, ctx_v
            lk, lv = modules[dim]
            new_k = _module_apply(lk, ctx_k, activation)
            new_v = _module_apply(lv, ctx_v, activation)
            if strength != 1.0:
                new_k = ctx_k + (new_k - ctx_k) * strength
                new_v = ctx_v + (new_v - ctx_v) * strength
            return new_k, new_v

        return patch


def load_hypernetwork(path_or_sd, name: str = "hypernetwork") -> Hypernetwork:
    """.pt loader (hypernetwork.py Hypernetwork.load): top-level dict maps
    int context dims → [k_state, v_state]; string keys carry metadata."""
    if isinstance(path_or_sd, (str, bytes)):
        from ..core.state_dict import load_torch_object

        sd = load_torch_object(path_or_sd)
    else:
        sd = path_or_sd
    activation = str(sd.get("activation_func", "linear") or "linear")
    modules: Dict[int, Tuple[list, list]] = {}
    for key, value in sd.items():
        if isinstance(key, int) and isinstance(value, (list, tuple)) and len(value) == 2:
            modules[key] = (_parse_module(value[0]), _parse_module(value[1]))
    return Hypernetwork(modules, activation, name)


def attach(p, hn: Hypernetwork, strength: float = 1.0) -> None:
    patch = hn.context_patch(strength)
    hooks = dict(p.unet_hooks or {})
    hooks["attn2_context_patch"] = hooks.get("attn2_context_patch", ()) + (patch,)
    p.unet_hooks = hooks
    p.extra_generation_params["Hypernet"] = hn.name
    if strength != 1.0:
        p.extra_generation_params["Hypernet strength"] = strength
