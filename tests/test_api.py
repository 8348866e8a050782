"""REST API contract tests (reference /sdapi/v1/* surface, modules/api/api.py
:211-249) driven against an in-process server with a tiny synthetic engine —
the automated form of upstream A1111's --test-server suite (SURVEY.md §4)."""

import base64
import json
import sys
import threading
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, "tests")

from fixtures import make_tiny_engine

PORT = 7899


@pytest.fixture(scope="module")
def server():
    from forge_tpu.api.server import create_server
    from forge_tpu.runtime.models import ModelManager

    mm = ModelManager()
    mm.set_engine(make_tiny_engine())
    srv = create_server(mm, "127.0.0.1", PORT)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _get(path):
    return json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{PORT}{path}", timeout=300).read())


def _post(path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}", json.dumps(body).encode(),
        {"Content-Type": "application/json"})
    return json.loads(urllib.request.urlopen(req, timeout=300).read())


PAYLOAD = {"prompt": "a cat", "seed": 5, "steps": 2, "width": 32, "height": 32,
           "sampler_name": "Euler", "cfg_scale": 7.0}


def test_listings(server):
    assert any(s["name"] == "UniPC" for s in _get("/sdapi/v1/samplers"))
    assert any(s["name"] == "karras" for s in _get("/sdapi/v1/schedulers"))
    assert isinstance(_get("/sdapi/v1/upscalers"), list)
    assert "module_list" in _get("/controlnet/module_list")
    assert isinstance(_get("/sdapi/v1/options"), dict)
    assert _get("/internal/ping") == {}


def test_index_serves_ui(server):
    html = urllib.request.urlopen(f"http://127.0.0.1:{PORT}/", timeout=60).read().decode()
    assert "<title>forge-tpu</title>" in html
    # panels are built from a JS template: check the template + static anchors
    for anchor in ("-generate", "genPanel", "sdapi/v1/progress", "mask-canvas",
                   "settings-grid", "pnginfo-drop", "cn-module", "alwayson_scripts",
                   "refiner", "hr-upscaler", "sdapi/v1/png-info",
                   "sdapi/v1/extra-single-image"):
        assert anchor in html, f"UI missing {anchor}"


def test_txt2img_and_pnginfo_roundtrip(server):
    r = _post("/sdapi/v1/txt2img", PAYLOAD)
    assert len(r["images"]) == 1
    info = json.loads(r["info"])
    assert info["seed"] == 5
    pi = _post("/sdapi/v1/png-info", {"image": r["images"][0]})
    assert "Steps: 2" in pi["info"]
    assert pi["parameters"]["Prompt"] == "a cat"

    # determinism through the full HTTP stack
    r2 = _post("/sdapi/v1/txt2img", PAYLOAD)
    assert r["images"][0] == r2["images"][0]


def test_img2img(server):
    src = _post("/sdapi/v1/txt2img", PAYLOAD)["images"][0]
    r = _post("/sdapi/v1/img2img", {**PAYLOAD, "init_images": [src],
                                    "denoising_strength": 0.6})
    assert len(r["images"]) == 1


def test_extras(server):
    src = _post("/sdapi/v1/txt2img", PAYLOAD)["images"][0]
    r = _post("/sdapi/v1/extra-single-image",
              {"image": src, "upscaling_resize": 2, "upscaler_1": "Lanczos"})
    raw = base64.b64decode(r["image"])
    from PIL import Image
    import io

    img = Image.open(io.BytesIO(raw))
    assert img.size == (64, 64)


def test_unknown_alwayson_rejected(server):
    try:
        _post("/sdapi/v1/txt2img", {**PAYLOAD, "alwayson_scripts": {"bogus": {"args": []}}})
        raise AssertionError("expected 422")
    except urllib.error.HTTPError as e:
        assert e.code == 422


def test_options_roundtrip(server):
    _post("/sdapi/v1/options", {"CLIP_stop_at_last_layers": 2})
    assert _get("/sdapi/v1/options")["CLIP_stop_at_last_layers"] == 2
    _post("/sdapi/v1/options", {"CLIP_stop_at_last_layers": 1})


def test_api_basic_auth():
    """--api-auth: requests without credentials get 401, with them 200
    (reference api.py:276-300 auth + cmd_args --api-auth)."""
    import base64
    import threading
    import urllib.error
    import urllib.request

    from forge_tpu.api.server import create_server
    from forge_tpu.runtime.models import ModelManager

    mm = ModelManager()
    mm.set_engine(make_tiny_engine())
    srv = create_server(mm, "127.0.0.1", 7897, api_auth="alice:secret")
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        try:
            urllib.request.urlopen("http://127.0.0.1:7897/sdapi/v1/samplers", timeout=10)
            assert False, "expected 401"
        except urllib.error.HTTPError as e:
            assert e.code == 401
        req = urllib.request.Request("http://127.0.0.1:7897/sdapi/v1/samplers")
        req.add_header("Authorization",
                       "Basic " + base64.b64encode(b"alice:secret").decode())
        assert urllib.request.urlopen(req, timeout=10).status == 200
    finally:
        srv.shutdown()


def test_xyz_grid_api(server):
    out = _post("/sdapi/v1/xyz-grid", {
        **PAYLOAD, "x_axis": {"field": "seed", "values": [1, 2]},
        "y_axis": {"field": "cfg_scale", "values": [5.0, 9.0]}})
    assert len(out["images"]) == 1
    png = base64.b64decode(out["images"][0])
    assert png[:4] == b"\x89PNG"
    from PIL import Image
    import io

    grid = Image.open(io.BytesIO(png))
    assert grid.size == (64, 64)  # 2×2 of 32² tiles


def test_latent_upscale_modes_and_cmd_flags(server):
    modes = _get("/sdapi/v1/latent-upscale-modes")
    assert {"name": "Latent (bicubic)"} in modes and len(modes) >= 6
    flags = _get("/sdapi/v1/cmd-flags")
    assert isinstance(flags, dict)  # populated by webui.main at launch


def test_lora_listing_and_refresh(server, tmp_path, monkeypatch):
    import os

    from forge_tpu.core.save import save_safetensors

    monkeypatch.chdir(tmp_path)
    os.makedirs("models/Lora")
    save_safetensors({"lora_unet_x.alpha": np.asarray(1.0, np.float32)},
                     "models/Lora/testlora.safetensors")
    assert _post("/sdapi/v1/refresh-loras", {}) == {}
    names = [x["name"] for x in _get("/sdapi/v1/loras")]
    assert "testlora" in names


def test_ui_has_new_tabs(server):
    page = urllib.request.urlopen(f"http://127.0.0.1:{PORT}/", timeout=30).read().decode()
    for tab in ("xyz", "merge", "extensions"):
        assert f'data-tab="{tab}"' in page, tab
    assert "/sdapi/v1/xyz-grid" in page and "/sdapi/v1/merge-checkpoints" in page


def test_merge_checkpoints_api(tmp_path):
    from forge_tpu.api.server import Api
    from forge_tpu.core.save import save_safetensors
    from forge_tpu.core.state_dict import load_state_dict
    from forge_tpu.runtime.models import ModelManager

    a = {"model.diffusion_model.x.weight": np.full((4, 4), 1.0, np.float32)}
    b = {"model.diffusion_model.x.weight": np.full((4, 4), 3.0, np.float32)}
    save_safetensors(a, str(tmp_path / "ckpt_a.safetensors"))
    save_safetensors(b, str(tmp_path / "ckpt_b.safetensors"))
    mm = ModelManager(checkpoint_dirs=[str(tmp_path)])
    api = Api(mm)
    names = list(mm.checkpoints)
    na = next(n for n in names if "ckpt_a" in n)
    nb = next(n for n in names if "ckpt_b" in n)
    out = api.merge_checkpoints(None, {
        "primary": na, "secondary": nb,
        "interp_method": "weighted_sum", "multiplier": 0.5,
        "custom_name": "mergetest"})
    merged = load_state_dict(out["path"])
    assert np.allclose(np.asarray(merged["model.diffusion_model.x.weight"],
                                  np.float32), 2.0)
    assert any("mergetest" in n for n in mm.checkpoints)  # refresh picked it up


def test_network_metadata_roundtrip(server, tmp_path, monkeypatch):
    import os

    from forge_tpu.core.save import save_safetensors

    monkeypatch.chdir(tmp_path)
    os.makedirs("models/Lora")
    save_safetensors({"lora_unet_x.alpha": np.asarray(1.0, np.float32)},
                     "models/Lora/metalora.safetensors")
    _post("/sdapi/v1/refresh-loras", {})
    md = _get("/sdapi/v1/extra-networks/metadata?name=metalora")
    assert md["description"] == ""
    out = _post("/sdapi/v1/extra-networks/metadata",
                {"name": "metalora", "description": "test net",
                 "activation text": "trigger word", "preferred weight": 0.7})
    assert out["description"] == "test net"
    md2 = _get("/sdapi/v1/extra-networks/metadata?name=metalora")
    assert md2["activation text"] == "trigger word"
    assert os.path.exists("models/Lora/metalora.json")


def test_localization_route(server, tmp_path, monkeypatch):
    """Localization dict round-trip (reference modules/localization.py):
    localizations/<name>.json served via /sdapi/v1/localization."""
    import json as _json
    import os as _os

    from forge_tpu.runtime.options import opts

    loc_dir = tmp_path / "localizations"
    loc_dir.mkdir()
    (loc_dir / "test_lang.json").write_text(
        _json.dumps({"Generate": "Generieren"}), encoding="utf8")
    cwd = _os.getcwd()
    monkeypatch.chdir(tmp_path)
    try:
        r = _get("/sdapi/v1/localization?name=test_lang")
    finally:
        monkeypatch.chdir(cwd)
    assert r["name"] == "test_lang"
    assert "test_lang" in r["available"]
    assert r["data"]["Generate"] == "Generieren"
    # default: option 'localization' (None → empty dict)
    assert opts.get("localization") == "None"
    r2 = _get("/sdapi/v1/localization")
    assert r2["data"] == {}


def test_script_name_dispatch(server):
    """Selectable-script API contract (reference api.py init_script_args):
    script_name routes the generation through the script's run()."""
    r = _post("/sdapi/v1/txt2img", {
        "prompt": "a cat|hat", "steps": 2, "width": 32, "height": 32,
        "seed": 3, "script_name": "Prompt matrix",
        "script_args": [False, False, "positive", "comma", 0]})
    assert len(r["images"]) == 3  # grid + 2 combos
    import urllib.error

    import pytest as _pytest

    with _pytest.raises(urllib.error.HTTPError) as ei:
        _post("/sdapi/v1/txt2img", {"prompt": "x", "steps": 1, "width": 32,
                                    "height": 32, "script_name": "nope"})
    assert ei.value.code == 422


def test_scripts_listing_includes_selectable(server):
    r = _get("/sdapi/v1/scripts")
    assert "SD upscale" in r["img2img"]
    assert "Prompt matrix" in r["txt2img"]
    assert "SD upscale" not in r["txt2img"]  # img2img-only
    info = _get("/sdapi/v1/script-info")
    pm = next(x for x in info if x["name"] == "Prompt matrix")
    assert pm["args"][0]["name"] == "put_at_start"


def test_extras_focal_crop(server):
    """Auto focal-point crop (reference postprocessing_focal_crop.py): the
    crop window follows the high-detail region instead of the center."""
    import base64 as _b64
    import io as _io

    from PIL import Image as _Image

    img = np.zeros((64, 128, 3), np.uint8)
    rng = np.random.default_rng(0)
    img[8:56, 96:124] = rng.integers(0, 255, (48, 28, 3))  # busy right side
    buf = _io.BytesIO()
    _Image.fromarray(img).save(buf, format="PNG")
    b64 = _b64.b64encode(buf.getvalue()).decode()
    r = _post("/sdapi/v1/extra-single-image", {
        "image": b64, "resize_mode": 1, "upscaling_resize_w": 64,
        "upscaling_resize_h": 64, "upscaler_1": "None",
        "focal_crop_enabled": True})
    out = np.asarray(_Image.open(_io.BytesIO(_b64.b64decode(r["image"]))))
    assert out.shape == (64, 64, 3)
    # the busy region (right) must dominate the crop: its mean is high
    assert out.mean() > img[:, 32:96].mean() + 10


def test_create_embedding(server, tmp_path):
    """/sdapi/v1/create/embedding (reference api.py:782): token-embedding
    initialized vectors land as a loadable safetensors file."""
    r = _post("/sdapi/v1/create/embedding", {
        "name": "my-token", "num_vectors_per_token": 2,
        "init_text": "cat", "out_dir": str(tmp_path)})
    assert "my-token.safetensors" in r["info"]
    from forge_tpu.core.state_dict import load_state_dict

    sd = load_state_dict(str(tmp_path / "my-token.safetensors"))
    assert sd["emb_params"].shape[0] == 2
    assert np.abs(sd["emb_params"]).max() > 0  # init_text copied something
