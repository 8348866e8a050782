"""IC-Light relighting Space (reference extensions-builtin/forge_space_iclight/
forge_app.py): text-conditioned relighting of a foreground cutout.

Reference flow: (1) widen the SD1.5 UNet stem conv 4→8 input channels with
zero-init new channels and add the iclight_sd15_fc offset checkpoint
leaf-wise (forge_app.py:35-62); (2) per request, background-remove the
subject (BriaRMBG there, U²-Net here), VAE-encode the gray-composited
foreground, and concat that latent onto x at every denoise step
(hooked_unet_forward :44-50 → the x_concat hook manifest here); (3) txt2img
at low res — or img2img from a lighting-direction gradient — then pixel 2×
upscale + img2img at highres_denoise (:273-345).

The offset checkpoint ships in diffusers UNet key space; it is mapped to
the ldm tree via core.state_dict.diffusers_unet_to_ldm.

Run: python forge_app.py --host 127.0.0.1 --port 7873 \
       [--ckpt models/checkpoints/<sd15-realistic>.safetensors] \
       [--iclight models/iclight/iclight_sd15_fc.safetensors]
"""

import base64
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

BG_SOURCES = ("None", "Left Light", "Right Light", "Top Light", "Bottom Light")


def gradient_bg(source: str, width: int, height: int) -> "np.ndarray | None":
    """Lighting-direction initial background (reference forge_app.py:252-272)."""
    if source in (None, "", "None"):
        return None
    if source == "Left Light":
        g = np.linspace(255, 0, width)[None, :]
    elif source == "Right Light":
        g = np.linspace(0, 255, width)[None, :]
    elif source == "Top Light":
        g = np.linspace(255, 0, height)[:, None]
    elif source == "Bottom Light":
        g = np.linspace(0, 255, height)[:, None]
    else:
        raise ValueError(f"unknown bg source {source!r}")
    img = np.broadcast_to(g, (height, width)).astype(np.uint8)
    return np.repeat(img[..., None], 3, axis=2)


def resize_and_center_crop(image: np.ndarray, tw: int, th: int) -> np.ndarray:
    from PIL import Image

    pil = Image.fromarray(image)
    ow, oh = pil.size
    k = max(tw / ow, th / oh)
    rw, rh = int(round(ow * k)), int(round(oh * k))
    pil = pil.resize((rw, rh), Image.LANCZOS)
    left, top = (rw - tw) / 2, (rh - th) / 2
    return np.asarray(pil.crop((left, top, left + tw, top + th)))


def merge_iclight_unet(unet_tree, offset_sd):
    """Widen the stem conv to the offset's input width (zeros in the new
    channels, reference forge_app.py:36-41) and add offsets leaf-wise."""
    import jax.numpy as jnp

    from forge_tpu.core.state_dict import diffusers_unet_to_ldm, transform_for_jax
    from forge_tpu.core.tree import nest

    if any(k.startswith("down_blocks.") for k in offset_sd):
        offset_sd = diffusers_unet_to_ldm(offset_sd)
    off = nest(transform_for_jax(dict(offset_sd)))

    def walk(base, delta):
        if isinstance(delta, dict):
            out = dict(base)
            for k, v in delta.items():
                out[k] = walk(base[k], v)
            return out
        b = jnp.asarray(base)
        d = jnp.asarray(np.asarray(delta))
        if b.ndim == 4 and d.ndim == 4 and d.shape[2] > b.shape[2]:
            pad = jnp.zeros(b.shape[:2] + (d.shape[2] - b.shape[2],) + b.shape[3:],
                            b.dtype)
            b = jnp.concatenate([b, pad], axis=2)  # HWIO: widen input channels
        return (b.astype(jnp.float32) + d.astype(jnp.float32)).astype(b.dtype)

    return walk(unet_tree, off)


class ICLightPipeline:
    def __init__(self, engine, matter=None):
        self.engine = engine
        self.matter = matter  # U2NetMatter or None (accept pre-cut fg)

    @classmethod
    def from_files(cls, ckpt: str, iclight: str, u2net_dir: str = ""):
        from forge_tpu.core.state_dict import load_state_dict
        from forge_tpu.pipeline.engine import load_engine

        engine = load_engine(load_state_dict(ckpt))
        engine.loaded.unet = merge_iclight_unet(
            engine.loaded.unet, load_state_dict(iclight))
        matter = None
        if u2net_dir:
            try:
                from forge_tpu.models.u2net import U2NetMatter

                matter = U2NetMatter(model_dir=u2net_dir)
            except Exception:  # noqa: BLE001 — rmbg optional
                matter = None
        return cls(engine, matter)

    def _fg_latent(self, fg: np.ndarray, w: int, h: int):
        import jax.numpy as jnp

        fg = resize_and_center_crop(fg, w, h)
        x = jnp.asarray(fg[None].astype(np.float32) / 127.0 - 1.0)
        return self.engine.encode_first_stage(x)  # mode (no noise): reference
        # uses latent_dist.mode() (:280)

    def _hooks(self, fg_latent):
        # x_concat contract: return the concat source; the UNet broadcasts
        # the batch and resizes H/W to the active latent
        return {"x_concat": (lambda x: fg_latent,)}

    def run(self, input_fg: np.ndarray, prompt: str,
            a_prompt: str = "best quality", n_prompt: str = "lowres, bad "
            "anatomy, bad hands, cropped, worst quality",
            width: int = 512, height: int = 512, seed: int = -1,
            steps: int = 25, cfg: float = 2.0, bg_source: str = "None",
            lowres_denoise: float = 0.9, highres_scale: float = 1.5,
            highres_denoise: float = 0.5) -> np.ndarray:
        from forge_tpu.pipeline.processing import Processing, process_images

        if self.matter is not None:
            # reference run_rmbg (:229-240): alpha-composite onto neutral
            # gray so the model sees only the subject's own shading
            alpha = self.matter.mask(input_fg)[..., None]
            input_fg = np.clip(
                127 + (input_fg.astype(np.float32) - 127) * alpha,
                0, 255).astype(np.uint8)
        full = prompt + ", " + a_prompt if a_prompt else prompt

        p = Processing(prompt=full, negative_prompt=n_prompt, seed=seed,
                       steps=steps, width=width, height=height,
                       cfg_scale=cfg, sampler_name="DPM++ 2M SDE",
                       scheduler="karras", do_not_save_samples=True,
                       do_not_save_grid=True)
        bg = gradient_bg(bg_source, width, height)
        if bg is not None:
            p.init_images = [bg]
            p.denoising_strength = lowres_denoise
            p.steps = int(round(steps / lowres_denoise))
        p.unet_hooks = self._hooks(self._fg_latent(input_fg, width, height))
        low = process_images(self.engine, p).images[0]

        # pixel upscale → img2img second pass with a re-encoded fg latent
        from PIL import Image

        nw = int(round(width * highres_scale / 64.0) * 64)
        nh = int(round(height * highres_scale / 64.0) * 64)
        up = np.asarray(Image.fromarray(low).resize((nw, nh), Image.LANCZOS))
        p2 = Processing(prompt=full, negative_prompt=n_prompt, seed=seed,
                        steps=max(int(round(steps / highres_denoise)), 1),
                        width=nw, height=nh, cfg_scale=cfg,
                        sampler_name="DPM++ 2M SDE", scheduler="karras",
                        init_images=[up], denoising_strength=highres_denoise,
                        do_not_save_samples=True, do_not_save_grid=True)
        p2.unet_hooks = self._hooks(self._fg_latent(input_fg, nw, nh))
        return process_images(self.engine, p2).images[0]


PAGE = """<!doctype html><html><head><title>IC-Light</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>body{font-family:sans-serif;background:#111;color:#eee;max-width:720px;
margin:2em auto}img{max-width:100%}input[type=text]{width:100%}
label{display:block;margin:.4em 0}button{padding:.5em 1.5em}</style></head>
<body><h2>IC-Light relighting</h2>
<label>Foreground image <input type=file id=f accept=image/*></label>
<label>Prompt <input type=text id=p value="beautiful woman, cinematic lighting"></label>
<label>Lighting <select id=bg>%BG%</select>
Seed <input type=number id=seed value=12345></label>
<button onclick="go()">Relight</button>
<div><img id=out></div>
<script>
async function go(){
 const file=document.getElementById('f').files[0]; if(!file)return;
 const b=await file.arrayBuffer();
 const b64=btoa(new Uint8Array(b).reduce((s,c)=>s+String.fromCharCode(c),''));
 const r=await fetch('/process',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({image:b64,prompt:document.getElementById('p').value,
   bg_source:document.getElementById('bg').value,
   seed:parseInt(document.getElementById('seed').value)})});
 const j=await r.json();
 if(j.error){alert(j.error);return}
 document.getElementById('out').src='data:image/png;base64,'+j.image;
}
</script></body></html>""".replace(
    "%BG%", "".join(f"<option>{b}</option>" for b in BG_SOURCES))


def process(body, pipe):
    from PIL import Image

    raw = base64.b64decode(body["image"])
    img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
    out = pipe.run(img, body.get("prompt", ""),
                   seed=int(body.get("seed", 12345)),
                   bg_source=body.get("bg_source", "None"))
    buf = io.BytesIO()
    Image.fromarray(out).save(buf, format="PNG")
    return {"image": base64.b64encode(buf.getvalue()).decode()}


def main():
    from forge_tpu.runtime.space_harness import run_space

    root = os.path.join(os.path.dirname(__file__), "..", "..")
    run_space("iclight space", PAGE, process, default_port=7873, args=[
        ("--ckpt", {"default": os.environ.get(
            "ICLIGHT_CKPT", os.path.join(root, "models", "checkpoints",
                                         "realisticVision_v51.safetensors"))}),
        ("--iclight", {"default": os.environ.get(
            "ICLIGHT_OFFSET", os.path.join(root, "models", "iclight",
                                           "iclight_sd15_fc.safetensors"))}),
        ("--u2net-dir", {"default": os.path.join(root, "models", "u2net")}),
    ], setup=lambda a: ICLightPipeline.from_files(a.ckpt, a.iclight, a.u2net_dir))


if __name__ == "__main__":
    main()
