"""Illusion-Diffusion Space (reference extensions-builtin/
forge_space_illusion_diffusion/forge_app.py): a pattern image (QR code,
logo, text, spiral) conditions an SD1.5 ControlNet while the prompt paints
over it, producing hidden-image illusion art.

Reference flow (forge_app.py:156-211 inference): center-crop the pattern to
512² and 1024², txt2img 15 steps with the ControlNet at the illusion
strength and a guidance window, nearest-exact 2× LATENT upscale, then
img2img 20 steps at `upscaler_strength`. Here the whole two-pass flow is
one Processing with hires-fix (hr_upscaler='Latent (nearest-exact)') — the
framework's hires pass IS the reference's upscale+img2img, and the attached
ControlNet rides both passes (hints auto-resize per pass).

Run: python forge_app.py --host 127.0.0.1 --port 7871 \
       [--ckpt models/checkpoints/<sd15>.safetensors] \
       [--controlnet models/ControlNet/<qrmonster>.safetensors]
"""

import base64
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

PAGE = """<!doctype html><html><head><title>Illusion Diffusion</title>
<style>body{font-family:sans-serif;background:#111;color:#eee;max-width:720px;
margin:2em auto}img{max-width:100%}input[type=text]{width:100%}
label{display:block;margin:.4em 0}button{padding:.5em 1.5em}</style></head>
<body><h2>Illusion Diffusion</h2>
<label>Pattern image <input type=file id=f accept=image/*></label>
<label>Prompt <input type=text id=p value="a medieval village, winding roads"></label>
<label>Negative <input type=text id=n value="low quality, blurry"></label>
<label>Illusion strength <input type=range id=s min=0 max=2 step=0.05 value=1></label>
<label>Seed <input type=number id=seed value=-1></label>
<button onclick="go()">Generate</button>
<div><img id=out></div>
<script>
async function go(){
 const file=document.getElementById('f').files[0]; if(!file)return;
 const b=await file.arrayBuffer();
 const b64=btoa(new Uint8Array(b).reduce((s,c)=>s+String.fromCharCode(c),''));
 const r=await fetch('/process',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({image:b64,prompt:document.getElementById('p').value,
   negative:document.getElementById('n').value,
   strength:parseFloat(document.getElementById('s').value),
   seed:parseInt(document.getElementById('seed').value)})});
 const j=await r.json();
 if(j.error){alert(j.error);return}
 document.getElementById('out').src='data:image/png;base64,'+j.image;
}
</script></body></html>"""


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """Reference center_crop_resize (forge_app.py:92): crop to the short
    side, resize to size²."""
    from PIL import Image

    h, w = img.shape[:2]
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    crop = img[top:top + s, left:left + s]
    return np.asarray(Image.fromarray(crop).resize((size, size), Image.LANCZOS))


class IllusionPipeline:
    """Engine + ControlNet wired into the two-pass hires flow."""

    def __init__(self, engine, cn_params, cn_cfg, cn_digest="illusion"):
        self.engine = engine
        self.cn_params = cn_params
        self.cn_cfg = cn_cfg
        self.cn_digest = cn_digest

    @classmethod
    def from_files(cls, ckpt: str, controlnet: str):
        from forge_tpu.extensions.controlnet import load_control_model
        from forge_tpu.pipeline.engine import load_engine
        from forge_tpu.core.state_dict import load_state_dict

        engine = load_engine(load_state_dict(ckpt))
        kind, params, cfg, digest = load_control_model(controlnet)
        if kind != "controlnet":
            raise ValueError(f"{controlnet} is a {kind}, need a cldm ControlNet")
        return cls(engine, params, cfg, digest)

    def run(self, pattern: np.ndarray, prompt: str, negative: str = "",
            strength: float = 1.0, guidance_scale: float = 8.0,
            guidance_start: float = 0.0, guidance_end: float = 1.0,
            upscaler_strength: float = 0.5, seed: int = -1,
            base_size: int = 512, steps: int = 15) -> np.ndarray:
        import jax.numpy as jnp

        from forge_tpu.models.controlnet import ControlNetState
        from forge_tpu.pipeline.processing import Processing, process_images

        hint = jnp.asarray(
            center_crop(pattern, base_size)[None].astype(np.float32) / 255.0)
        p = Processing(
            prompt=prompt, negative_prompt=negative, seed=seed,
            steps=steps, width=base_size, height=base_size,
            cfg_scale=guidance_scale, sampler_name="DPM++ SDE",
            scheduler="karras",
            enable_hr=True, hr_scale=2.0,
            hr_upscaler="Latent (nearest-exact)",
            hr_second_pass_steps=20, hr_denoising_strength=upscaler_strength,
            do_not_save_samples=True, do_not_save_grid=True)
        p.controlnets = [ControlNetState(
            params=self.cn_params, hint=hint, strength=strength,
            start_percent=guidance_start, end_percent=guidance_end,
            cfg=self.cn_cfg, digest=self.cn_digest)]
        res = process_images(self.engine, p)
        return res.images[0]


def process(body, pipe):
    from PIL import Image

    raw = base64.b64decode(body["image"])
    img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
    out = pipe.run(
        img, body.get("prompt", ""), body.get("negative", ""),
        strength=float(body.get("strength", 1.0)),
        guidance_scale=float(body.get("guidance_scale", 8.0)),
        upscaler_strength=float(body.get("upscaler_strength", 0.5)),
        seed=int(body.get("seed", -1)))
    buf = io.BytesIO()
    Image.fromarray(out).save(buf, format="PNG")
    return {"image": base64.b64encode(buf.getvalue()).decode()}


def main():
    from forge_tpu.runtime.space_harness import run_space

    root = os.path.join(os.path.dirname(__file__), "..", "..")
    run_space("illusion space", PAGE, process, default_port=7871, args=[
        ("--ckpt", {"default": os.environ.get(
            "ILLUSION_CKPT", os.path.join(root, "models", "checkpoints",
                                          "illusion_sd15.safetensors"))}),
        ("--controlnet", {"default": os.environ.get(
            "ILLUSION_CONTROLNET", os.path.join(root, "models", "ControlNet",
                                                "qrmonster_sd15.safetensors"))}),
    ], setup=lambda a: IllusionPipeline.from_files(a.ckpt, a.controlnet))


if __name__ == "__main__":
    main()
