"""Human surface-normal estimation Space (reference extensions-builtin/
forge_space_sapiens_normal/forge_app.py): upload a photo of a person, get a
normal-map visualization with the background masked out. Serves a single-page
UI + POST /process; the net is forge_tpu.models.sapiens (see its docstring
for the torchscript→state-dict substitution note).

Run: python forge_app.py --host 127.0.0.1 --port 7870 [--model-dir DIR]
"""

import base64
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

PAGE = """<!doctype html><html><head><title>Sapiens Normal Estimation</title>
<style>body{font-family:sans-serif;background:#000;color:#eee;max-width:720px;
margin:2em auto}img{max-width:100%%}button{padding:.5em 1.5em}</style>
</head><body>
<h2>Normal Estimation (Sapiens)</h2>
<input type=file id=f accept=image/*>
<label><input type=checkbox id=mask checked> mask background</label>
<button onclick="go()">Run</button>
<div><img id=out></div>
<script>
async function go(){
 const file=document.getElementById('f').files[0]; if(!file)return;
 const b=await file.arrayBuffer();
 const b64=btoa(new Uint8Array(b).reduce((s,c)=>s+String.fromCharCode(c),''));
 const r=await fetch('/process',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({image:b64,mask:document.getElementById('mask').checked})});
 const j=await r.json();
 if(j.error){alert(j.error);return}
 document.getElementById('out').src='data:image/png;base64,'+j.image;
}
</script></body></html>"""


def process(body, net):
    from PIL import Image

    raw = base64.b64decode(body["image"])
    img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
    out = net.normals(img, mask_background=bool(body.get("mask", True)))
    buf = io.BytesIO()
    Image.fromarray(out, "RGB").save(buf, format="PNG")
    return {"image": base64.b64encode(buf.getvalue()).decode()}


def _setup(args):
    from forge_tpu.models.sapiens import SapiensNormal

    return SapiensNormal(model_dir=args.model_dir)


def main():
    from forge_tpu.runtime.space_harness import run_space

    run_space("sapiens space", PAGE, process, default_port=7870, args=[
        ("--model-dir", {"default": os.environ.get(
            "SAPIENS_MODEL_DIR", os.path.join(os.path.dirname(__file__), "..",
                                              "..", "models", "sapiens"))}),
    ], setup=_setup)


if __name__ == "__main__":
    main()
