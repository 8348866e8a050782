"""ControlNet / T2I-Adapter units: loading, preprocessing, and attachment.

Behavioral twin of the integrated ControlNet extension
(extensions-builtin/sd_forge_controlnet/scripts/controlnet.py:547-563 Script
hooks, modules_forge/supported_controlnet.py:39-148 model dispatch,
lib_controlnet API unit schema): an API/user supplies unit dicts
{enabled, module, model|model_path, image(b64|array), weight,
guidance_start, guidance_end, processor_res, threshold_a, threshold_b,
advanced_weighting}; `attach_units` runs the preprocessor, loads the net,
and appends gating-wrapped states to p.controlnets.
"""

from __future__ import annotations

import base64
import hashlib
import io
import os
from typing import Any, Dict, List, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from ..core.state_dict import as_device_tree, load_state_dict, transform_for_jax
from ..core.tree import nest
from ..models.controlnet import ControlNetState
from ..models.t2i_adapter import T2IAdapterState, detect_adapter_config
from ..models.unet import UNetConfig
from ..preprocessors import get_preprocessor
from ..preprocessors.cv import bilinear_resize
from ..runtime.scripts import Script

_MODEL_CACHE: Dict[str, Any] = {}
_MODEL_DIRS = ["models/ControlNet", "models/controlnet"]


def set_model_dirs(dirs):
    global _MODEL_DIRS
    _MODEL_DIRS = list(dirs)


def list_controlnet_models() -> List[str]:
    out = []
    for d in _MODEL_DIRS:
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if f.endswith((".safetensors", ".ckpt", ".pt", ".pth", ".bin")):
                    out.append(os.path.splitext(f)[0])
    return out


def _find_clip_vision() -> Optional[str]:
    """First checkpoint under models/clip_vision (Revision's bigG encoder)."""
    for d in ("models/clip_vision", "models/ClipVision"):
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if f.endswith((".safetensors", ".ckpt", ".pt", ".pth", ".bin")):
                    return os.path.join(d, f)
    return None


def _find_model(name: str) -> Optional[str]:
    if os.path.isfile(name):
        return name
    for d in _MODEL_DIRS:
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            if os.path.splitext(f)[0] == name or f == name:
                return os.path.join(d, f)
    return None


def load_control_model(path: str):
    """→ ('controlnet'|'t2i_adapter', params_tree, cfg, digest).

    Detection mirrors modules_forge/supported_controlnet.py: cldm nets carry
    input_hint_block/zero_convs (possibly under a control_model. prefix);
    T2I adapters carry conv_in + body.N blocks."""
    if path in _MODEL_CACHE:
        return _MODEL_CACHE[path]
    sd = load_state_dict(path)
    digest = hashlib.sha256(
        ("|".join(sorted(sd.keys())) + path).encode()).hexdigest()[:16]
    if any(k.startswith("control_model.") for k in sd):
        sd = {k[len("control_model."):]: v for k, v in sd.items()
              if k.startswith("control_model.")}
    if "lora_controlnet" in sd:
        # ControlLora: encoder weights come from the live UNet + low-rank
        # deltas; assembly is deferred until an engine is present
        kind = "control_lora"
        _MODEL_CACHE[path] = (kind, sd, None, digest)
        return _MODEL_CACHE[path]
    # device-resident: ControlNetState.params travel as jit ARGUMENTS, and
    # jax re-uploads numpy arguments on every call (core/state_dict.py
    # as_device_tree) — measured 40 s/image for an SDXL cldm over the tunnel
    import jax
    import jax.numpy as jnp

    storage = jnp.bfloat16 if jax.default_backend() == "tpu" else None  # preserve checkpoint dtype off-TPU
    if any(k.startswith("input_hint_block") for k in sd):
        kind = "controlnet"
        params = as_device_tree(nest(transform_for_jax(sd)), dtype=storage)
        cfg = _cn_config(sd)
    elif "conv_in.weight" in sd and any(k.startswith("body.") for k in sd):
        kind = "t2i_adapter"
        params = as_device_tree(nest(transform_for_jax(sd)), dtype=storage)
        cfg = detect_adapter_config(params)
    else:
        raise ValueError(f"unrecognized control model format: {path}")
    _MODEL_CACHE[path] = (kind, params, cfg, digest)
    return _MODEL_CACHE[path]


_CL_CACHE: Dict[Any, Any] = {}


def assemble_control_lora(engine, sd: Mapping[str, Any], model_digest: str):
    """ControlLora → full cldm params: the encoder trunk is copied from the
    live UNet, control-specific checkpoint weights overlay it, and low-rank
    `.up`/`.down` deltas add onto the shared weights — the functional form of
    the reference's ControlLora.pre_run + ControlLoraOps lazy weight merge
    (backend/patcher/controlnet.py:360-474). → (params_tree, cfg)."""
    key = (id(engine.loaded.unet), model_digest)
    if key in _CL_CACHE:
        return _CL_CACHE[key]
    from ..core.tree import flatten
    from ..ops.quant import dequantize, is_quantized

    out: Dict[str, Any] = {}
    for k, v in flatten(engine.loaded.unet).items():
        if k.split(".")[0] in ("input_blocks", "middle_block", "time_embed",
                               "label_emb"):
            out[k] = v
    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        if k == "lora_controlnet":
            continue
        if k.endswith(".up") or k.endswith(".down"):
            base, which = k.rsplit(".", 1)
            pairs.setdefault(base, {})[which] = np.asarray(v, np.float32)
        else:
            arr = np.asarray(v)
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
            out[k] = jnp.asarray(arr)
    for base, ud in pairs.items():
        wkey = base + ".weight"
        w = out.get(wkey)
        if w is None or "up" not in ud or "down" not in ud:
            continue
        if is_quantized(w):
            w = dequantize(w, jnp.float32)
        warr = np.asarray(w, np.float32)
        up, down = ud["up"], ud["down"]
        delta = up.reshape(up.shape[0], -1) @ down.reshape(down.shape[0], -1)
        if warr.ndim == 4:  # ours HWIO; delta is torch-flat [O, I·kh·kw]
            kh, kw, ci, co = warr.shape
            delta = delta.reshape(co, ci, kh, kw).transpose(2, 3, 1, 0)
        else:
            delta = delta.reshape(warr.shape)
        out[wkey] = jnp.asarray(warr + delta, jnp.asarray(w).dtype)
    params = nest(out)
    _CL_CACHE[key] = (params, engine.unet_cfg)
    return _CL_CACHE[key]


def _cn_config(sd: Mapping[str, np.ndarray]) -> UNetConfig:
    """Sniff the cldm's attention geometry from checkpoint shapes."""
    ctx = None
    for k, v in sd.items():
        if k.endswith("attn2.to_k.weight"):
            ctx = v.shape[1]
            break
    model_ch = sd["input_blocks.0.0.weight"].shape[0]
    use_linear = False
    for k, v in sd.items():
        if k.endswith(".proj_in.weight"):
            use_linear = v.ndim == 2
            break
    if ctx in (None, 768):
        return UNetConfig(context_dim=768, num_heads=max(model_ch // 40, 1))
    if ctx == 2048:
        adm = sd.get("label_emb.0.0.weight")
        return UNetConfig(context_dim=2048, head_dim=64, use_linear_projection=use_linear,
                          adm_in_channels=adm.shape[1] if adm is not None else 2816)
    return UNetConfig(context_dim=ctx, head_dim=64, use_linear_projection=use_linear)


def _decode_image(image) -> np.ndarray:
    """unit['image']: b64 string | ndarray | {'image': ...} → uint8 [H,W,3]."""
    if isinstance(image, dict):
        image = image.get("image")
    if isinstance(image, str):
        from PIL import Image

        raw = base64.b64decode(image.split(",", 1)[-1])
        img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
        return img
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.0 else arr, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=2)
    return arr[..., :3]


def _decode_unit_mask(unit: Mapping[str, Any], image) -> Optional[np.ndarray]:
    """unit['mask'] / image dict {'mask': ...} → float [H,W] in [0,1]."""
    m = unit.get("mask")
    if m is None:
        m = unit.get("mask_image")
    if m is None and isinstance(image, dict):
        m = image.get("mask")
    if m is None:
        return None
    arr = _decode_image(m)
    return np.asarray(arr[..., 0], np.float32) / 255.0


def build_unit_state(unit: Mapping[str, Any], width: int, height: int):
    """One API unit dict → ControlNetState/T2IAdapterState (or None)."""
    if not unit.get("enabled", True):
        return None
    image = unit.get("image")
    if image is None:
        return None
    img = _decode_image(image)
    module = unit.get("module", "none") or "none"
    if module.startswith("reference"):
        # weightless style guidance: no control model, no hint map — the unit
        # image is VAE-encoded per generation (needs the engine → deferred;
        # reference do_not_need_model units, forge_reference.py:44)
        def build_ref(engine, p, cond, uncond, _img=img, _m=module, _u=dict(unit)):
            from ..pipeline.reference_only import attach_reference

            attach_reference(
                engine, p, _img, _m,
                style_fidelity=float(_u.get("threshold_a", 0.5) or 0.5),
                weight=float(_u.get("weight", 1.0)),
                start=float(_u.get("guidance_start", 0.0)),
                end=float(_u.get("guidance_end", 1.0)))

        return build_ref
    if "revision" in module.lower():
        # Revision: CLIP-vision bigG image embed replaces the SDXL pooled
        # conditioning — no control model (reference preprocessor_revision.py,
        # do_not_need_model=True). Weights via unit clip_vision_path or the
        # models/clip_vision dir.
        cv_path = unit.get("clip_vision_path") or _find_clip_vision()
        if cv_path is None:
            raise FileNotFoundError(
                "Revision needs CLIP-ViT-bigG weights: pass clip_vision_path "
                "or place a checkpoint under models/clip_vision")
        ignore = "ignore" in module.lower()

        def build_rev(engine, p, cond, uncond, _img=img, _u=dict(unit),
                      _cv=cv_path, _ig=ignore):
            from ..pipeline.ipadapter import load_ip_adapter
            from ..pipeline.revision import apply_revision, encode_revision_embed

            emb = encode_revision_embed(load_ip_adapter(_cv), _img,
                                        float(_u.get("weight", 1.0)))
            apply_revision(p, cond, uncond, emb, _ig)

        return build_rev
    if module.lower().startswith("inpaint"):
        # masked pixels become −1 in the hint; inpaint_only additionally arms
        # the latent + final composites (pipeline/cn_inpaint.py — reference
        # preprocessor_inpaint.py)
        from ..pipeline.cn_inpaint import mix_hint

        mask_arr = _decode_unit_mask(unit, image)
        if mask_arr is None:
            mask_arr = np.zeros(img.shape[:2], np.float32)
        low = module.lower()
        src_img = img
        if low.endswith("lama"):
            from ..preprocessors.lama import lama_prefill

            src_img = lama_prefill(img, mask_arr)
        img_r = bilinear_resize(np.asarray(src_img, np.float32) / 255.0,
                                height, width)
        mask_r = np.clip(bilinear_resize(
            np.repeat(mask_arr[..., None], 3, 2), height, width)[..., 0], 0, 1)
        fmap = mix_hint(img_r, mask_r)  # digest input; hint range [−1,1]
        hint = jnp.asarray(fmap[None], jnp.float32)
        res = 0
        extra = []
        if low in ("inpaint_only", "inpaint_only+lama"):
            def build_inp(engine, p, cond, uncond, _img=src_img, _m=mask_arr,
                          _lama=low.endswith("lama")):
                from ..pipeline.cn_inpaint import attach_inpaint_only

                attach_inpaint_only(engine, p, _img, _m, lama_shift=_lama)

            extra.append(build_inp)
    else:
        res = int(unit.get("processor_res", 0) or 0) or min(img.shape[:2])
        fmap = get_preprocessor(module)(
            img, res, unit.get("threshold_a", 0) or 0, unit.get("threshold_b", 0) or 0)
        fmap = np.clip(bilinear_resize(fmap, height, width), 0.0, 1.0)
        hint = jnp.asarray(fmap[None], jnp.float32)
        extra = []

    model_name = unit.get("model") or unit.get("model_path")
    if not model_name or str(model_name).lower() in ("none", "null"):
        # inpaint_only without a control model still applies its composites
        return extra or None
    path = _find_model(str(model_name))
    if path is None:
        raise FileNotFoundError(f"controlnet model {model_name!r} not found in {_MODEL_DIRS}")
    kind, params, cfg, model_digest = load_control_model(path)

    digest = hashlib.sha256(
        f"{model_digest}|{module}|{res}|{unit.get('threshold_a')}|"
        f"{unit.get('threshold_b')}|{fmap.shape}|"
        f"{hashlib.sha256(np.ascontiguousarray(fmap).tobytes()).hexdigest()}".encode()
    ).hexdigest()[:16]

    common = dict(
        hint=hint,
        strength=float(unit.get("weight", 1.0)),
        start_percent=float(unit.get("guidance_start", 0.0)),
        end_percent=float(unit.get("guidance_end", 1.0)),
        block_weights=unit.get("advanced_weighting"),
        digest=digest,
    )
    if kind == "control_lora":
        # needs the live UNet: return a deferred builder (runs once per
        # generation, after the engine is known)
        def build(engine, p, cond, uncond, _sd=params, _common=common):
            cl_params, cl_cfg = assemble_control_lora(engine, _sd, model_digest)
            state = ControlNetState(params=cl_params, cfg=cl_cfg, **_common)
            p.controlnets = list(p.controlnets or []) + [state]

        return build
    if kind == "t2i_adapter":
        st = T2IAdapterState(params=params, cfg=cfg, **common)
    else:
        st = ControlNetState(params=params, cfg=cfg, **common)
    return [st] + extra if extra else st


def attach_units(p, units) -> int:
    """Build states for every enabled unit and append to p.controlnets
    (ControlLora/reference/revision/inpaint units attach via deferred
    builders — they need the engine; a unit may yield both, e.g.
    inpaint_only = model state + composite builder)."""
    states = []
    n = 0
    for unit in units or ():
        st = build_unit_state(unit, p.width, p.height)
        if st is None:
            continue
        n += 1
        for item in (st if isinstance(st, list) else [st]):
            if callable(item):
                p.deferred_hooks = list(p.deferred_hooks or []) + [item]
            else:
                states.append(item)
    if states:
        p.controlnets = list(p.controlnets or []) + states
    return n


class ControlNetScript(Script):
    """alwayson script: consumes unit dicts from p (API alwayson_scripts or
    direct assignment of p.controlnet_units)."""

    name = "controlnet"
    alwayson = True

    def __init__(self, units=None):
        self.units = units

    def process(self, p):
        units = self.units if self.units is not None else getattr(p, "controlnet_units", None)
        attach_units(p, units)
