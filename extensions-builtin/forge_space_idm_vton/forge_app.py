"""IDM-VTON virtual try-on Space (reference extensions-builtin/
forge_space_idm_vton/): dress a person photo in a garment photo.

Reference mechanism (src/tryon_pipeline.py:1783-1804 +
attentionhacked_tryon.py:335): a *garment* SDXL UNet runs on the clean cloth
latent each timestep and records the pre-attention hidden states of every
self-attention block; the *tryon* UNet (13-channel inpaint variant: noisy 4 +
mask 1 + masked-person 4 + pose 4) concatenates those features into its attn1
keys/values — zeroed for the uncond CFG branch (tryon_pipeline.py:1793).

TPU-native re-expression: both UNets are the existing tree-driven
models/unet.py; the feature hand-off is the `attn1_context_patch` hook ABI
(capture on the garment pass, sequence-concat on the tryon pass) traced into
ONE jitted Euler step — no module surgery. The reference's insightface/
densepose/humanparsing auto-masking stack is replaced by an explicit mask
(or a documented torso-box default) and an optional pose image encoded
through the VAE; openpose renders from forge_tpu.preprocessors work here.

Checkpoint: one safetensors with the standard SDXL keys (model.diffusion_model
= the 13-ch tryon UNet) plus the garment UNet under
`garment_model.diffusion_model.`.

Run: python forge_app.py --host H --port P [--ckpt FILE]
"""

import base64
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


class IdmVtonPipeline:
    def __init__(self, engine, garment_unet):
        import jax

        from forge_tpu.core.state_dict import as_device_tree

        self.engine = engine
        self.garment = as_device_tree(garment_unet)
        self._step = jax.jit(self._step_fn)

    @classmethod
    def from_file(cls, path: str):
        from forge_tpu.core.state_dict import (filter_prefix, load_state_dict,
                                               transform_for_jax)
        from forge_tpu.core.tree import nest
        from forge_tpu.pipeline.engine import load_engine

        import jax.numpy as jnp

        sd = load_state_dict(path)
        gp = "garment_model.diffusion_model."
        garment_sd = filter_prefix(sd, gp)
        base_sd = {k: v for k, v in sd.items() if not k.startswith(gp)}
        engine = load_engine(base_sd)
        garment = nest({k: jnp.asarray(v)
                        for k, v in transform_for_jax(garment_sd).items()})
        return cls(engine, garment)

    # -- one Euler step: garment pass (capture) + cond/uncond tryon passes --
    def _step_fn(self, tryon, garment, x, sigma, sigma_next, extra_ch,
                 cloth_latent, cond, uncond, cloth_cond, cfg_scale):
        import jax.numpy as jnp

        from forge_tpu.models.unet import unet_apply

        pred = self.engine.predictor
        t = jnp.full((x.shape[0],), pred.timestep(sigma), jnp.float32)

        feats = []

        def capture(ctx_k, ctx_v, extra):
            feats.append(ctx_k)
            return ctx_k, ctx_v

        unet_apply(garment, cloth_latent, t, cloth_cond["context"],
                   y=cloth_cond.get("y"),
                   hooks={"attn1_context_patch": (capture,)})

        def inject(zero):
            idx = {"i": 0}

            def fn(ctx_k, ctx_v, extra):
                f = feats[idx["i"]]
                idx["i"] += 1
                if zero:
                    f = jnp.zeros_like(f)
                if f.shape[0] != ctx_k.shape[0]:
                    f = jnp.tile(f, (ctx_k.shape[0] // f.shape[0], 1, 1))
                f = f.astype(ctx_k.dtype)
                return (jnp.concatenate([ctx_k, f], axis=1),
                        jnp.concatenate([ctx_v, f], axis=1))

            return fn

        # scheduler scaling applies to the noisy latents only; conditioning
        # channels ride unscaled (diffusers inpaint convention the reference
        # pipeline follows)
        x_in = jnp.concatenate(
            [pred.calculate_input(sigma, x).astype(x.dtype), extra_ch], axis=-1)
        eps_c = unet_apply(tryon, x_in, t, cond["context"], y=cond.get("y"),
                           hooks={"attn1_context_patch": (inject(False),)})
        eps_u = unet_apply(tryon, x_in, t, uncond["context"], y=uncond.get("y"),
                           hooks={"attn1_context_patch": (inject(True),)})
        den_c = pred.calculate_denoised(sigma, eps_c, x)
        den_u = pred.calculate_denoised(sigma, eps_u, x)
        denoised = den_u + cfg_scale * (den_c - den_u)
        d = (x - denoised) / sigma
        return x + d * (sigma_next - sigma)

    @staticmethod
    def default_mask(h: int, w: int) -> np.ndarray:
        """Torso-box fallback when no mask is supplied (the reference derives
        this from humanparsing+openpose, src/tryon_pipeline.py; an explicit
        mask is the faithful input here)."""
        m = np.zeros((h, w), np.float32)
        m[int(0.18 * h):int(0.72 * h), int(0.22 * w):int(0.78 * w)] = 1.0
        return m

    def run(self, person: np.ndarray, garment_img: np.ndarray,
            garment_desc: str = "clothes", mask: np.ndarray = None,
            pose: np.ndarray = None, steps: int = 20, cfg_scale: float = 2.0,
            seed: int = 0, width: int = 768, height: int = 1024) -> np.ndarray:
        import cv2
        import jax.numpy as jnp

        from forge_tpu.sampling.schedules import get_sigmas

        eng = self.engine
        h8, w8 = height // 8, width // 8

        person_r = cv2.resize(person, (width, height),
                              interpolation=cv2.INTER_AREA)
        garment_r = cv2.resize(garment_img, (width, height),
                               interpolation=cv2.INTER_AREA)
        if mask is None:
            mask = self.default_mask(height, width)
        else:
            mask = cv2.resize(mask.astype(np.float32), (width, height))
            if mask.max() > 1.5:
                mask = mask / 255.0

        to_lat = lambda img: eng.encode_first_stage(
            jnp.asarray(img, jnp.float32)[None] / 127.5 - 1.0)
        person_lat = to_lat(person_r)
        masked = person_r.astype(np.float32) * (1.0 - mask[..., None])
        masked_lat = to_lat(masked.clip(0, 255).astype(np.uint8))
        cloth_lat = to_lat(garment_r)
        pose_lat = (to_lat(cv2.resize(pose, (width, height)))
                    if pose is not None
                    else jnp.zeros_like(person_lat))
        mask_lat = jnp.asarray(
            cv2.resize(mask, (w8, h8), interpolation=cv2.INTER_LINEAR),
            jnp.float32)[None, ..., None]
        extra_ch = jnp.concatenate([mask_lat, masked_lat, pose_lat], axis=-1)

        prompt = f"model is wearing {garment_desc}"
        cond = eng.get_learned_conditioning([prompt], width, height)
        uncond = eng.get_learned_conditioning(
            ["monochrome, lowres, bad anatomy, worst quality, low quality"],
            width, height, is_negative=True)
        cloth_cond = eng.get_learned_conditioning(
            [f"a photo of {garment_desc}"], width, height)

        sigmas = get_sigmas("normal", int(steps), eng.predictor)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal(person_lat.shape), jnp.float32) \
            * float(sigmas[0])
        for i in range(len(sigmas) - 1):
            s, sn = float(sigmas[i]), float(sigmas[i + 1])
            x = self._step(eng.loaded.unet, self.garment, x,
                           jnp.asarray(s, jnp.float32),
                           jnp.asarray(sn, jnp.float32),
                           extra_ch, cloth_lat, cond, uncond, cloth_cond,
                           jnp.asarray(cfg_scale, jnp.float32))

        img = np.asarray(eng.decode_first_stage(x)[0], np.float32)
        img = ((img + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        # composite the untouched region back (reference pastes the original
        # person outside the try-on mask)
        out = img * mask[..., None] + person_r * (1.0 - mask[..., None])
        out = out.clip(0, 255).astype(np.uint8)
        return cv2.resize(out, (person.shape[1], person.shape[0]),
                          interpolation=cv2.INTER_LINEAR)


PAGE = """<!doctype html><html><head><title>IDM-VTON</title>
<style>body{font-family:sans-serif;background:#111;color:#eee;max-width:900px;
margin:2em auto}img{max-width:32%}button{padding:.5em 1.5em}
input[type=text]{width:60%}</style></head><body>
<h2>Virtual Try-On (IDM-VTON)</h2>
<p>person <input type=file id=person accept=image/*>
garment <input type=file id=garment accept=image/*>
mask (optional) <input type=file id=mask accept=image/*></p>
<input type=text id=desc value="short sleeve round neck t-shirt">
<label>steps <input type=number id=steps value=20 min=1 max=50></label>
<label>seed <input type=number id=seed value=0></label>
<button onclick="go()">Try on</button>
<div><img id=out></div>
<script>
async function b64(input){const f=input.files[0];if(!f)return null;
 const b=await f.arrayBuffer();
 return btoa(new Uint8Array(b).reduce((s,c)=>s+String.fromCharCode(c),''))}
async function go(){
 const p=await b64(document.getElementById('person'));
 const g=await b64(document.getElementById('garment'));
 if(!p||!g)return alert('upload person and garment photos');
 const m=await b64(document.getElementById('mask'));
 const r=await fetch('/process',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({person:p,garment:g,mask:m,
   desc:document.getElementById('desc').value,
   steps:parseInt(document.getElementById('steps').value),
   seed:parseInt(document.getElementById('seed').value)})});
 const j=await r.json(); if(j.error){alert(j.error);return}
 document.getElementById('out').src='data:image/png;base64,'+j.image;
}
</script></body></html>"""


def process(body, pipe):
    from PIL import Image

    def dec(b64s, mode="RGB"):
        if not b64s:
            return None
        return np.asarray(Image.open(io.BytesIO(
            base64.b64decode(b64s))).convert(mode))

    out = pipe.run(
        dec(body["person"]), dec(body["garment"]),
        garment_desc=body.get("desc", "clothes"),
        mask=dec(body.get("mask"), "L"),
        steps=int(body.get("steps", 20)),
        cfg_scale=float(body.get("cfg_scale", 2.0)),
        seed=int(body.get("seed", 0)),
        width=int(body.get("width", 768)),
        height=int(body.get("height", 1024)))
    buf = io.BytesIO()
    Image.fromarray(out).save(buf, format="PNG")
    return {"image": base64.b64encode(buf.getvalue()).decode()}


def main():
    from forge_tpu.runtime.space_harness import run_space

    root = os.path.join(os.path.dirname(__file__), "..", "..")
    run_space("idm-vton space", PAGE, process, default_port=7875, args=[
        ("--ckpt", {"default": os.environ.get(
            "IDM_VTON_CKPT", os.path.join(root, "models", "idm_vton",
                                          "idm_vton.safetensors"))}),
    ], setup=lambda a: IdmVtonPipeline.from_file(a.ckpt))


if __name__ == "__main__":
    main()
