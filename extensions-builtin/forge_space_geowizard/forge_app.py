"""GeoWizard Space (reference extensions-builtin/forge_space_geowizard/
forge_app.py + geo_models/geowizard_pipeline.py): joint depth + surface-normal
estimation by a modified SD2 UNet that denoises a geometry latent conditioned
on the image latent (8-channel input concat), a CLIP image embedding as
cross-attention context, and a 10-d sin/cos "domain switcher" class embedding
(indoor/outdoor/object, geowizard_pipeline.py:258-270).

TPU-native re-expression: the denoise loop is one `lax.scan` DDIM program
(jit-compiled, explicit-arg params per the repo perf rule) over the existing
tree-driven UNet/VAE/CLIP-vision models — no torch pipeline objects. The
checkpoint is a single safetensors with `unet.` (ldm or diffusers key space),
`vae.` and `image_encoder.` prefixes.

Run: python forge_app.py --host H --port P [--ckpt FILE]
"""

import base64
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

LATENT_SCALE = 0.18215
DOMAINS = {"indoor": [1.0, 0.0, 0.0], "outdoor": [0.0, 1.0, 0.0],
           "object": [0.0, 0.0, 1.0]}


class GeoWizardPipeline:
    def __init__(self, unet_params, vae_params, clipvision_params):
        import jax

        from forge_tpu.core.state_dict import as_device_tree

        self.unet = as_device_tree(unet_params)
        self.vae = as_device_tree(vae_params)
        self.clipvision = as_device_tree(clipvision_params)
        self._infer = jax.jit(self._infer_fn, static_argnames=("steps",))

    @classmethod
    def from_file(cls, path: str):
        from forge_tpu.core.state_dict import (
            diffusers_unet_to_ldm, filter_prefix, load_state_dict,
            transform_for_jax)
        from forge_tpu.core.tree import nest

        sd = load_state_dict(path)
        unet_sd = filter_prefix(sd, "unet.")
        if any(k.startswith("down_blocks.") for k in unet_sd):
            unet_sd = diffusers_unet_to_ldm(unet_sd)
        vae_sd = filter_prefix(sd, "vae.")
        enc_sd = filter_prefix(sd, "image_encoder.")

        def tree(s):
            import jax.numpy as jnp

            return nest({k: jnp.asarray(v)
                         for k, v in transform_for_jax(s).items()})

        return cls(tree(unet_sd), tree(vae_sd), tree(enc_sd))

    @staticmethod
    def _class_embedding(domain: str):
        import jax.numpy as jnp

        # hybrid switcher (geowizard_pipeline.py:258-270): rows = [depth,
        # normal]; 10-d = sin/cos of the 2-d geo one-hot + 3-d domain one-hot
        geo = jnp.asarray([[0.0, 1.0], [1.0, 0.0]], jnp.float32)
        dom = jnp.asarray(DOMAINS[domain], jnp.float32)[None].repeat(2, 0)
        return jnp.concatenate(
            [jnp.sin(geo), jnp.cos(geo), jnp.sin(dom), jnp.cos(dom)], axis=-1)

    def _infer_fn(self, unet, vae, clipvision, rgb, noise, class_emb, steps):
        """rgb [1,H,W,3] in [-1,1] → (depth [H,W], normal [H,W,3])."""
        import jax
        import jax.numpy as jnp

        from forge_tpu.models.clipvision import clip_vision_apply
        from forge_tpu.models.unet import unet_apply
        from forge_tpu.models.vae import vae_decode, vae_encode
        from forge_tpu.sampling.prediction import make_beta_schedule

        # CLIP image embedding as the (single-token) cross-attn context
        # (geowizard_pipeline.py:226: image_embeds.unsqueeze(1))
        feed = jax.image.resize(rgb, (1, 224, 224, 3), "bilinear")
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], rgb.dtype)
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711], rgb.dtype)
        feed = ((feed + 1.0) / 2.0 - mean) / std
        img_embed, _, _ = clip_vision_apply(clipvision, feed)
        context = jnp.broadcast_to(img_embed[:, None, :],
                                   (2, 1, img_embed.shape[-1]))

        rgb_latent = vae_encode(vae, rgb) * LATENT_SCALE
        rgb_latent = jnp.concatenate([rgb_latent, rgb_latent], axis=0)
        geo = noise  # [2, h, w, 4]

        alphas_cumprod = jnp.asarray(
            np.cumprod(1.0 - make_beta_schedule(1000), axis=0), jnp.float32)
        ts = jnp.linspace(999.0, 0.0, steps).round().astype(jnp.int32)
        ts_prev = jnp.concatenate([ts[1:], jnp.asarray([-1], jnp.int32)])

        def step(geo, t_pair):
            t, t_prev = t_pair
            a_t = alphas_cumprod[t]
            a_prev = jnp.where(t_prev >= 0, alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
            x_in = jnp.concatenate([rgb_latent, geo], axis=-1)
            eps = unet_apply(unet, x_in, jnp.full((2,), t, jnp.float32),
                             context, y=class_emb)
            x0 = (geo - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            geo = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
            return geo, None

        geo, _ = jax.lax.scan(step, geo, (ts, ts_prev))

        decoded = vae_decode(vae, geo / LATENT_SCALE)  # [2, H, W, 3]
        depth = jnp.clip(decoded[0].mean(-1), -1.0, 1.0)
        depth = (depth + 1.0) / 2.0
        lo, hi = depth.min(), depth.max()
        depth = (depth - lo) / jnp.maximum(hi - lo, 1e-6)
        normal = jnp.clip(decoded[1], -1.0, 1.0)
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-5)
        return depth, normal

    def run(self, img: np.ndarray, domain: str = "indoor",
            denoise_steps: int = 10, seed: int = 0,
            processing_res: int = 768):
        """uint8 [H,W,3] → (depth_vis uint8 [H,W], normal_vis uint8 [H,W,3])."""
        import cv2
        import jax.numpy as jnp

        h, w = img.shape[:2]
        scale = processing_res / max(h, w)
        # latent-friendly working size (multiple of 64, like the reference's
        # resize_max_res preprocessing)
        nh = max(64, int(round(h * scale / 64)) * 64)
        nw = max(64, int(round(w * scale / 64)) * 64)
        feed = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
        rgb = jnp.asarray(feed, jnp.float32)[None] / 127.5 - 1.0

        rng = np.random.default_rng(seed)
        noise = jnp.asarray(rng.standard_normal((2, nh // 8, nw // 8, 4)),
                            jnp.float32)
        depth, normal = self._infer(
            self.unet, self.vae, self.clipvision, rgb, noise,
            self._class_embedding(domain), steps=int(denoise_steps))
        depth = cv2.resize(np.asarray(depth, np.float32), (w, h),
                           interpolation=cv2.INTER_LINEAR)
        normal = cv2.resize(np.asarray(normal, np.float32), (w, h),
                            interpolation=cv2.INTER_LINEAR)
        # resampling averages unit vectors — renormalize after the resize
        normal /= np.maximum(
            np.linalg.norm(normal, axis=-1, keepdims=True), 1e-5)
        # reference visualization: depth inverted grayscale (forge_app.py:94),
        # normals mapped to [0,255]
        depth_vis = ((1.0 - depth) * 255.0).clip(0, 255).astype(np.uint8)
        normal_vis = ((normal + 1.0) / 2.0 * 255.0).clip(0, 255).astype(np.uint8)
        return depth_vis, normal_vis


PAGE = """<!doctype html><html><head><title>GeoWizard</title>
<style>body{font-family:sans-serif;background:#111;color:#eee;max-width:900px;
margin:2em auto}img{max-width:49%}button{padding:.5em 1.5em}</style>
</head><body>
<h2>GeoWizard — depth &amp; normal estimation</h2>
<input type=file id=f accept=image/*>
<select id=domain><option>indoor</option><option>outdoor</option>
<option>object</option></select>
<label>steps <input type=number id=steps value=10 min=1 max=50></label>
<label>seed <input type=number id=seed value=0></label>
<button onclick="go()">Run</button>
<div><img id=depth><img id=normal></div>
<script>
async function go(){
 const file=document.getElementById('f').files[0]; if(!file)return;
 const b=await file.arrayBuffer();
 const b64=btoa(new Uint8Array(b).reduce((s,c)=>s+String.fromCharCode(c),''));
 const r=await fetch('/process',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({image:b64,domain:document.getElementById('domain').value,
   steps:parseInt(document.getElementById('steps').value),
   seed:parseInt(document.getElementById('seed').value)})});
 const j=await r.json(); if(j.error){alert(j.error);return}
 document.getElementById('depth').src='data:image/png;base64,'+j.depth;
 document.getElementById('normal').src='data:image/png;base64,'+j.normal;
}
</script></body></html>"""


def process(body, pipe):
    from PIL import Image

    img = np.asarray(Image.open(io.BytesIO(
        base64.b64decode(body["image"]))).convert("RGB"))
    depth, normal = pipe.run(
        img, domain=body.get("domain", "indoor"),
        denoise_steps=int(body.get("steps", 10)),
        seed=int(body.get("seed", 0)),
        processing_res=int(body.get("processing_res", 768)))

    def enc(arr, mode):
        buf = io.BytesIO()
        Image.fromarray(arr, mode).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    return {"depth": enc(depth, "L"), "normal": enc(normal, "RGB")}


def main():
    from forge_tpu.runtime.space_harness import run_space

    root = os.path.join(os.path.dirname(__file__), "..", "..")
    run_space("geowizard space", PAGE, process, default_port=7874, args=[
        ("--ckpt", {"default": os.environ.get(
            "GEOWIZARD_CKPT", os.path.join(root, "models", "geowizard",
                                           "geowizard.safetensors"))}),
    ], setup=lambda a: GeoWizardPipeline.from_file(a.ckpt))


if __name__ == "__main__":
    main()
