"""Forge Spaces lifecycle (runtime/spaces.py): discovery from
space_meta.json dirs, subprocess launch on a free port, terminate."""

import json
import numpy as np
import os
import textwrap
import urllib.request

from forge_tpu.runtime.spaces import SpaceManager, find_free_port


def _make_space(root, name):
    d = root / name
    d.mkdir(parents=True)
    (d / "space_meta.json").write_text(json.dumps({"title": "Tiny Space", "tag": "test"}))
    (d / "forge_app.py").write_text(textwrap.dedent("""\
        import argparse
        from http.server import BaseHTTPRequestHandler, HTTPServer

        class H(BaseHTTPRequestHandler):
            def do_GET(self):
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"tiny space ok")
            def log_message(self, *a):
                pass

        ap = argparse.ArgumentParser()
        ap.add_argument("--host", default="127.0.0.1")
        ap.add_argument("--port", type=int, required=True)
        a = ap.parse_args()
        HTTPServer((a.host, a.port), H).serve_forever()
    """))
    return d


def _hermetic_env():
    """Subprocess env for space launches in tests: pure-CPU jax with the
    accelerator PJRT plugin UNREGISTERED. The axon plugin registers from a
    sitecustomize on PYTHONPATH and its first backend access blocks when
    the TPU tunnel is down — CPU tests must not depend on that transport."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    return env


def test_discovery_and_lifecycle(tmp_path):
    _make_space(tmp_path, "forge_space_tiny")
    (tmp_path / "not_a_space").mkdir()
    mgr = SpaceManager([str(tmp_path)])
    infos = mgr.list()
    assert [i["name"] for i in infos] == ["forge_space_tiny"]
    assert infos[0]["installed"] and not infos[0]["running"]

    url = mgr.launch("forge_space_tiny")
    try:
        body = urllib.request.urlopen(url, timeout=10).read()
        assert body == b"tiny space ok"
        assert mgr.list()[0]["running"] and mgr.list()[0]["url"] == url
    finally:
        mgr.terminate("forge_space_tiny")
    assert not mgr.list()[0]["running"]


def test_uninstalled_space_reports_and_refuses(tmp_path):
    d = tmp_path / "forge_space_empty"
    d.mkdir()
    (d / "space_meta.json").write_text("{}")
    mgr = SpaceManager([str(tmp_path)])
    info = mgr.list()[0]
    assert not info["installed"]
    try:
        mgr.launch("forge_space_empty")
        assert False, "expected RuntimeError"
    except RuntimeError:
        pass


def test_find_free_port():
    p = find_free_port(start_port=7911)
    assert p >= 7911


def test_structured_logging(tmp_path):
    """runtime/logging.py: JSON-lines events, rotation, never-raise."""
    import json as _json

    from forge_tpu.runtime import logging as flog

    path = tmp_path / "ev.jsonl"
    flog.configure(str(path))
    flog.log_event("generation", sampler="Euler a", duration_s=1.25)
    flog.log_event("api_request", path="/sdapi/v1/txt2img", status=200)
    lines = [_json.loads(ln) for ln in path.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["event"] == "generation" and lines[0]["sampler"] == "Euler a"
    assert "ts" in lines[1]
    # rotation
    flog.configure(str(path), max_bytes=1)
    flog.log_event("x")
    flog.log_event("y")
    assert (tmp_path / "ev.jsonl.1").exists()
    flog.configure("logs/events.jsonl")  # restore default for other tests


def _tiny_u2net_sd(mid=4, ch=8):
    """Scaled-down published U²-Net topology (depths 7,6,5,4,4F,4F)."""
    r = np.random.default_rng(0)
    sd = {}

    def conv(key, o, i, k=3):
        sd[key + ".conv_s1.weight"] = (r.standard_normal((o, i, k, k)) * 0.2).astype(np.float32)
        sd[key + ".conv_s1.bias"] = np.zeros(o, np.float32)
        sd[key + ".bn_s1.weight"] = np.ones(o, np.float32)
        sd[key + ".bn_s1.bias"] = np.zeros(o, np.float32)
        sd[key + ".bn_s1.running_mean"] = np.zeros(o, np.float32)
        sd[key + ".bn_s1.running_var"] = np.ones(o, np.float32)

    def rsu(name, depth, cin, cout):
        conv(f"{name}.rebnconvin", cout, cin)
        conv(f"{name}.rebnconv1", mid, cout)
        for i in range(2, depth + 1):
            conv(f"{name}.rebnconv{i}", mid, mid)
        for i in range(depth - 1, 1, -1):
            conv(f"{name}.rebnconv{i}d", mid, mid * 2)
        conv(f"{name}.rebnconv1d", cout, mid * 2)

    depths = {"stage1": 7, "stage2": 6, "stage3": 5, "stage4": 4,
              "stage5": 4, "stage6": 4}
    rsu("stage1", 7, 3, ch)
    for s in ("stage2", "stage3", "stage4", "stage5", "stage6"):
        rsu(s, depths[s], ch, ch)
    for s, d in (("stage5d", 4), ("stage4d", 4), ("stage3d", 5),
                 ("stage2d", 6), ("stage1d", 7)):
        rsu(s, d, ch * 2, ch)
    for i in range(1, 7):
        sd[f"side{i}.weight"] = (r.standard_normal((1, ch, 3, 3)) * 0.2).astype(np.float32)
        sd[f"side{i}.bias"] = np.zeros(1, np.float32)
    sd["outconv.weight"] = (r.standard_normal((1, 6, 1, 1)) * 0.2).astype(np.float32)
    sd["outconv.bias"] = np.zeros(1, np.float32)
    return sd


def test_u2net_apply_shapes():
    import jax.numpy as jnp

    from forge_tpu.core.state_dict import transform_for_jax
    from forge_tpu.core.tree import nest
    from forge_tpu.models.u2net import u2net_apply

    params = nest({k: jnp.asarray(v)
                   for k, v in transform_for_jax(_tiny_u2net_sd()).items()})
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 3)),
                    jnp.float32)
    out = np.asarray(u2net_apply(params, x))
    assert out.shape == (1, 64, 64, 1)
    assert np.isfinite(out).all() and (out >= 0).all() and (out <= 1).all()


def test_birefnet_space_end_to_end(tmp_path):
    """The bundled space launches through the SpaceManager lifecycle and
    serves a cutout for a synthetic checkpoint (VERDICT r2 next #8)."""
    import base64
    import io
    import json as _json
    import urllib.request

    from PIL import Image

    from forge_tpu.core.save import save_safetensors

    model_dir = tmp_path / "u2net"
    model_dir.mkdir()
    save_safetensors(_tiny_u2net_sd(), str(model_dir / "u2netp.safetensors"))

    os.environ["U2NET_MODEL_DIR"] = str(model_dir)
    try:
        mgr = SpaceManager(["extensions-builtin"])
        assert "forge_space_birefnet" in mgr.spaces
        url = mgr.launch("forge_space_birefnet", timeout=180, env=_hermetic_env())
        # UI page serves
        page = urllib.request.urlopen(url, timeout=10).read().decode()
        assert "Remove Background" in page
        # process round-trip: synthetic image → RGBA cutout
        img = Image.fromarray(np.full((48, 40, 3), 200, np.uint8))
        buf = io.BytesIO(); img.save(buf, format="PNG")
        req = urllib.request.Request(
            url + "/process",
            data=_json.dumps({"image": base64.b64encode(buf.getvalue()).decode(),
                              "size": 64}).encode(),
            headers={"Content-Type": "application/json"})
        out = _json.loads(urllib.request.urlopen(req, timeout=600).read())
        cut = Image.open(io.BytesIO(base64.b64decode(out["image"])))
        assert cut.mode == "RGBA" and cut.size == (40, 48)
        mgr.terminate_all()
        assert not mgr.spaces["forge_space_birefnet"].running
    finally:
        os.environ.pop("U2NET_MODEL_DIR", None)


def test_caption_space_lifecycle(tmp_path):
    """Second bundled space: discovery + launch + graceful no-model error."""
    import base64
    import io
    import json as _json
    import urllib.request

    from PIL import Image

    os.environ["CAPTION_MODEL_ROOT"] = str(tmp_path)  # no checkpoints
    try:
        mgr = SpaceManager(["extensions-builtin"])
        assert "forge_space_florence_2" in mgr.spaces
        url = mgr.launch("forge_space_florence_2", timeout=180, env=_hermetic_env())
        page = urllib.request.urlopen(url, timeout=10).read().decode()
        assert "Image Caption" in page
        img = Image.fromarray(np.zeros((16, 16, 3), np.uint8))
        buf = io.BytesIO(); img.save(buf, format="PNG")
        req = urllib.request.Request(
            url + "/process",
            data=_json.dumps({"image": base64.b64encode(buf.getvalue()).decode()}).encode(),
            headers={"Content-Type": "application/json"})
        out = _json.loads(urllib.request.urlopen(req, timeout=60).read())
        assert "no captioner checkpoints" in out.get("error", "")
        mgr.terminate_all()
    finally:
        os.environ.pop("CAPTION_MODEL_ROOT", None)


def _load_space_app(space_dir: str, name: str):
    """Import a bundled space's forge_app.py under a UNIQUE module name —
    every space uses the filename forge_app.py, so import_module("forge_app")
    returns whichever space was imported first in the process."""
    import importlib.util
    import os as _os
    import sys

    path = _os.path.join("extensions-builtin", space_dir, "forge_app.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_illusion_space_pipeline():
    """Bundled illusion-diffusion Space: two-pass hires flow with a
    ControlNet riding both passes — the hint auto-resizes to the hires
    latent (regression: used to shape-clash in the second pass)."""
    import sys as _sys

    import jax.numpy as jnp

    _sys.path.insert(0, "tests")
    app = _load_space_app("forge_space_illusion_diffusion", "illusion_app")
    from fixtures import make_tiny_engine
    from test_controlnet import CN_CFG, make_cldm_sd
    from forge_tpu.core.state_dict import transform_for_jax
    from forge_tpu.core.tree import nest

    cn = nest(transform_for_jax(make_cldm_sd()))
    pipe = app.IllusionPipeline(make_tiny_engine(), cn, CN_CFG)
    pattern = np.zeros((40, 48, 3), np.uint8)  # non-square: exercises crop
    pattern[10:30, 10:30] = 255
    out = pipe.run(pattern, "cat", seed=5, base_size=32, steps=2,
                   upscaler_strength=0.6)
    assert out.shape == (64, 64, 3)  # 2x hires target
    weak = pipe.run(pattern, "cat", seed=5, base_size=32, steps=2,
                    upscaler_strength=0.6, strength=0.0)
    assert not np.array_equal(out, weak), "illusion strength had no effect"


def test_animagine_space_pipeline():
    """Bundled animagine Space: tag presets compose into the prompt and the
    aspect preset sets the resolution; optional upscale = hires pass."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    app = _load_space_app("forge_space_animagine_xl_31", "animagine_app")

    pos, neg = app.apply_preset(app.QUALITY_TAGS, "Standard v3.1", "1girl", "bad")
    assert pos.startswith("1girl, masterpiece") and "lowres" in neg and neg.endswith("bad")
    assert app.pick_size("896 x 1152", 0, 0) == (896, 1152)
    assert app.pick_size("Custom", 513, 511) == (512, 504)

    from test_sdxl import _tiny_sdxl_checkpoint
    from forge_tpu.pipeline.engine import load_engine

    pipe = app.AnimaginePipeline(load_engine(_tiny_sdxl_checkpoint()))
    out = pipe.run("1girl", seed=7, steps=2, aspect="Custom",
                   custom_width=64, custom_height=32)
    assert out.shape == (32, 64, 3)


def test_iclight_space_pipeline():
    """Bundled IC-Light Space: stem conv widens 4->8 input channels, the
    foreground latent rides x_concat through both passes, and the lighting
    gradient changes the output."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    app = _load_space_app("forge_space_iclight", "iclight_app")
    from fixtures import make_tiny_engine, make_unet_sd

    eng = make_tiny_engine()
    # synthetic offset in ldm key space: zeros except a widened stem conv
    r = np.random.default_rng(0)
    off = {k: np.zeros_like(v) for k, v in make_unet_sd(prefix="").items()}
    w = off["input_blocks.0.0.weight"]  # OIHW [C,4,3,3]
    off["input_blocks.0.0.weight"] = (
        r.standard_normal((w.shape[0], 8, 3, 3)) * 0.01).astype(np.float32)
    eng.loaded.unet = app.merge_iclight_unet(eng.loaded.unet, off)
    stem = eng.loaded.unet["input_blocks"]["0"]["0"]["weight"]
    assert stem.shape[2] == 8  # HWIO input width

    pipe = app.ICLightPipeline(eng)
    fg = np.zeros((48, 40, 3), np.uint8)
    fg[12:36, 10:30] = 220
    out = pipe.run(fg, "cat", width=32, height=32, seed=3, steps=2,
                   highres_scale=2.0, highres_denoise=0.5)
    assert out.shape == (64, 64, 3)
    lit = pipe.run(fg, "cat", width=32, height=32, seed=3, steps=2,
                   bg_source="Left Light", highres_scale=2.0,
                   highres_denoise=0.5)
    assert not np.array_equal(out, lit)


def _tiny_sapiens_sd(width=32, depth=2, patch=16, grid=(64, 48), out_ch=3):
    """Scaled-down Sapiens ViT + deconv head in the port's key layout."""
    r = np.random.default_rng(0)
    sd = {}

    def lin(key, o, i):
        sd[key + ".weight"] = (r.standard_normal((o, i)) * 0.05).astype(np.float32)
        sd[key + ".bias"] = np.zeros(o, np.float32)

    def norm(key, d):
        sd[key + ".weight"] = np.ones(d, np.float32)
        sd[key + ".bias"] = np.zeros(d, np.float32)

    sd["patch_embed.proj.weight"] = (
        r.standard_normal((width, 3, patch, patch)) * 0.05).astype(np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(width, np.float32)
    sd["pos_embed"] = (r.standard_normal(
        (1, grid[0] * grid[1], width)) * 0.02).astype(np.float32)
    for i in range(depth):
        norm(f"blocks.{i}.norm1", width)
        lin(f"blocks.{i}.attn.qkv", 3 * width, width)
        lin(f"blocks.{i}.attn.proj", width, width)
        norm(f"blocks.{i}.norm2", width)
        lin(f"blocks.{i}.mlp.fc1", 4 * width, width)
        lin(f"blocks.{i}.mlp.fc2", width, 4 * width)
    norm("norm", width)
    for j, (o, i) in enumerate([(width, width), (width, width)]):
        sd[f"head.deconv.{j}.weight"] = (
            r.standard_normal((i, o, 4, 4)) * 0.05).astype(np.float32)
        sd[f"head.deconv.{j}.bias"] = np.zeros(o, np.float32)
    sd["head.conv.weight"] = (
        r.standard_normal((out_ch, width, 3, 3)) * 0.05).astype(np.float32)
    sd["head.conv.bias"] = np.zeros(out_ch, np.float32)
    return sd


def test_sapiens_apply_shapes():
    """ViT dense predictor: patch grid -> 2 deconvs -> x4 upsampled output."""
    import jax.numpy as jnp

    from forge_tpu.core.state_dict import transform_for_jax
    from forge_tpu.core.tree import nest
    from forge_tpu.models.sapiens import sapiens_apply

    grid = (4, 3)  # matches a 64x48 input at patch 16
    params = nest({k: jnp.asarray(v) for k, v in transform_for_jax(
        _tiny_sapiens_sd(grid=grid)).items()})
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 48, 3)),
                    jnp.float32)
    out = np.asarray(sapiens_apply(params, x))
    assert out.shape == (1, 16, 12, 3)
    assert np.isfinite(out).all()


def test_sapiens_space_end_to_end(tmp_path):
    """Bundled sapiens space: launch, serve the page, produce a unit-norm
    normal-map visualization from a synthetic checkpoint."""
    import base64
    import io
    import json as _json
    import urllib.request

    from PIL import Image

    from forge_tpu.core.save import save_safetensors

    model_dir = tmp_path / "sapiens"
    model_dir.mkdir()
    save_safetensors(_tiny_sapiens_sd(), str(model_dir / "sapiens.safetensors"))

    os.environ["SAPIENS_MODEL_DIR"] = str(model_dir)
    try:
        mgr = SpaceManager(["extensions-builtin"])
        assert "forge_space_sapiens_normal" in mgr.spaces
        url = mgr.launch("forge_space_sapiens_normal", timeout=180,
                         env=_hermetic_env())
        page = urllib.request.urlopen(url, timeout=10).read().decode()
        assert "Normal Estimation" in page
        img = Image.fromarray(np.full((48, 40, 3), 180, np.uint8))
        buf = io.BytesIO(); img.save(buf, format="PNG")
        req = urllib.request.Request(
            url + "/process",
            data=_json.dumps({"image": base64.b64encode(buf.getvalue()).decode(),
                              "mask": False}).encode(),
            headers={"Content-Type": "application/json"})
        out = _json.loads(urllib.request.urlopen(req, timeout=600).read())
        vis = np.asarray(Image.open(io.BytesIO(base64.b64decode(out["image"]))))
        assert vis.shape == (48, 40, 3)
        # visualization encodes unit vectors: (v/127.5-1) has norm ~1
        vecs = vis.astype(np.float32) / 127.5 - 1.0
        norms = np.linalg.norm(vecs, axis=-1)
        assert np.abs(norms - 1.0).max() < 0.05
        mgr.terminate_all()
    finally:
        os.environ.pop("SAPIENS_MODEL_DIR", None)


def _tiny_geowizard_ckpt(tmp_path):
    """unet(8ch in, 10-d class embed) + vae + clipvision in one safetensors."""
    from forge_tpu.core.save import save_safetensors
    from forge_tpu.core.synth import synth_unet_sd, synth_vae_sd

    sd = {}
    sd.update(synth_unet_sd(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        transformer_depth=(0, 1), middle_depth=1, context_dim=64,
        adm_in_channels=10, in_channels=8, fill="random", seed=21,
        prefix="unet."))
    sd.update(synth_vae_sd(ch=32, fill="random", seed=22, prefix="vae."))

    r = np.random.default_rng(23)
    W, PATCH = 64, 32

    def lin(key, o, i, bias=True):
        sd[key + ".weight"] = (r.standard_normal((o, i)) * 0.05).astype(np.float32)
        if bias:
            sd[key + ".bias"] = np.zeros(o, np.float32)

    def norm(key, d):
        sd[key + ".weight"] = np.ones(d, np.float32)
        sd[key + ".bias"] = np.zeros(d, np.float32)

    v = "image_encoder.vision_model."
    sd[v + "embeddings.patch_embedding.weight"] = (
        r.standard_normal((W, 3, PATCH, PATCH)) * 0.05).astype(np.float32)
    sd[v + "embeddings.class_embedding"] = np.zeros(W, np.float32)
    sd[v + "embeddings.position_embedding.weight"] = (
        r.standard_normal(((224 // PATCH) ** 2 + 1, W)) * 0.02).astype(np.float32)
    b = v + "encoder.layers.0."
    norm(b + "layer_norm1", W)
    for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
        lin(b + "self_attn." + p, W, W)
    norm(b + "layer_norm2", W)
    lin(b + "mlp.fc1", W * 4, W)
    lin(b + "mlp.fc2", W, W * 4)
    norm(v + "post_layernorm", W)
    lin("image_encoder.visual_projection", 64, W, bias=False)

    path = str(tmp_path / "geowizard.safetensors")
    save_safetensors(sd, path)
    return path


def test_geowizard_space_pipeline(tmp_path):
    """Bundled geowizard space: DDIM scan over the 8-channel UNet produces
    depth + unit normals; the domain switcher changes the result."""
    app = _load_space_app("forge_space_geowizard", "geowizard_app")

    pipe = app.GeoWizardPipeline.from_file(_tiny_geowizard_ckpt(tmp_path))
    img = np.full((48, 40, 3), 120, np.uint8)
    img[10:38, 8:32] = 220
    depth, normal = pipe.run(img, domain="indoor", denoise_steps=2, seed=1,
                             processing_res=64)
    assert depth.shape == (48, 40) and depth.dtype == np.uint8
    assert normal.shape == (48, 40, 3) and normal.dtype == np.uint8
    vecs = normal.astype(np.float32) / 127.5 - 1.0
    assert np.abs(np.linalg.norm(vecs, axis=-1) - 1.0).max() < 0.1

    d2, n2 = pipe.run(img, domain="object", denoise_steps=2, seed=1,
                      processing_res=64)
    assert not (np.array_equal(depth, d2) and np.array_equal(normal, n2))


def test_idm_vton_space_pipeline(tmp_path):
    """Bundled idm-vton space: garment attn1 features ride into the tryon
    UNet through the hook ABI; 13-channel inpaint input; mask composite."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from forge_tpu.core.save import save_safetensors
    from forge_tpu.core.synth import synth_unet_sd

    from test_sdxl import _tiny_sdxl_checkpoint

    sd = _tiny_sdxl_checkpoint()
    # swap in a 13-channel tryon UNet (same geometry otherwise)
    sd = {k: v for k, v in sd.items()
          if not k.startswith("model.diffusion_model.")}
    from test_sdxl import ADM, CTX
    common = dict(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                  transformer_depth=(0, 1), middle_depth=1, context_dim=CTX,
                  adm_in_channels=ADM, fill="random")
    sd.update(synth_unet_sd(in_channels=13, seed=31, **common))
    sd.update(synth_unet_sd(in_channels=4, seed=32,
                            prefix="garment_model.diffusion_model.", **common))
    path = str(tmp_path / "idm_vton.safetensors")
    save_safetensors(sd, path)

    app = _load_space_app("forge_space_idm_vton", "idm_vton_app")
    pipe = app.IdmVtonPipeline.from_file(path)

    person = np.full((64, 48, 3), 140, np.uint8)
    person[8:56, 12:36] = 90
    garment = np.full((64, 48, 3), 30, np.uint8)
    garment[16:48, 8:40] = 250

    out = pipe.run(person, garment, garment_desc="red shirt", steps=2,
                   seed=4, width=32, height=32)
    assert out.shape == person.shape and out.dtype == np.uint8
    # region outside the try-on mask is the untouched person photo
    assert np.array_equal(out[0:4], person[0:4])
    # the masked region was regenerated
    assert not np.array_equal(out, person)

    # the garment actually conditions the output (zero-feature uncond differs)
    out2 = pipe.run(person, np.zeros_like(garment), garment_desc="red shirt",
                    steps=2, seed=4, width=32, height=32)
    assert not np.array_equal(out, out2)


def test_example_space_end_to_end():
    """The template space: launch, greet round-trip."""
    import json as _json
    import urllib.request

    mgr = SpaceManager(["extensions-builtin"])
    assert "forge_space_example" in mgr.spaces
    url = mgr.launch("forge_space_example", timeout=60, env=_hermetic_env())
    try:
        req = urllib.request.Request(
            url + "/process",
            data=_json.dumps({"name": "tpu", "intensity": 3}).encode(),
            headers={"Content-Type": "application/json"})
        out = _json.loads(urllib.request.urlopen(req, timeout=30).read())
        assert out["greeting"] == "Hello, tpu!!!"
    finally:
        mgr.terminate_all()
