"""Captioning Space (reference extensions-builtin/forge_space_florence_2):
upload an image → caption (BLIP) and/or booru tags (deepbooru). See
space_meta.json for the Florence-2 substitution note.

Run: python forge_app.py --host 127.0.0.1 --port 7871
"""

import base64
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

PAGE = """<!doctype html><html><head><title>Image Caption</title>
<style>body{font-family:sans-serif;background:#111;color:#eee;max-width:720px;
margin:2em auto}img{max-width:100%%}textarea{width:100%%;background:#1a1a1a;
color:#eee}button{padding:.5em 1.5em}</style></head><body>
<h2>Image Caption</h2>
<input type=file id=f accept=image/*>
<label><input type=checkbox id=tags checked> booru tags</label>
<button onclick="go()">Caption</button>
<div><textarea id=out rows=6 readonly></textarea></div>
<script>
async function go(){
 const file=document.getElementById('f').files[0]; if(!file)return;
 const b=await file.arrayBuffer();
 const b64=btoa(new Uint8Array(b).reduce((s,c)=>s+String.fromCharCode(c),''));
 const r=await fetch('/process',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({image:b64,tags:document.getElementById('tags').checked})});
 const j=await r.json();
 document.getElementById('out').value=j.error||((j.caption||'')+(j.tags?'\\n\\n'+j.tags:''));
}
</script></body></html>"""


def process(body, state):
    from PIL import Image

    img = np.asarray(Image.open(io.BytesIO(
        base64.b64decode(body["image"]))).convert("RGB"))
    out = {}
    if state["blip"].available:
        out["caption"] = state["blip"].caption(img)
    if body.get("tags") and state["booru"].available:
        out["tags"] = state["booru"].tag(img)
    if not out:
        out["error"] = ("no captioner checkpoints found — put BLIP "
                        "under models/BLIP or deepbooru under "
                        "models/torch_deepdanbooru")
    return out


def _setup(args):
    from forge_tpu.models.blip import BlipCaptioner
    from forge_tpu.postprocessing.deepbooru import DeepDanbooru

    return {"blip": BlipCaptioner(os.path.join(args.model_root, "BLIP")),
            "booru": DeepDanbooru(os.path.join(args.model_root,
                                               "torch_deepdanbooru"))}


def main():
    from forge_tpu.runtime.space_harness import run_space

    run_space("caption space", PAGE, process, default_port=7871, args=[
        ("--model-root", {"default": os.environ.get(
            "CAPTION_MODEL_ROOT",
            os.path.join(os.path.dirname(__file__), "..", "..", "models"))}),
    ], setup=_setup)


if __name__ == "__main__":
    main()
