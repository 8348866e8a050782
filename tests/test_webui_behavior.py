"""Headless behavioral drive of the SPA against a live server.

No JS engine exists in this environment, so the test covers the SPA↔API seam
two ways: (a) every endpoint literal the SPA's JS calls is extracted from the
served page and asserted to exist on the live router (UI↔server drift is the
failure mode this seam had no test for), and (b) the generate flow is
replayed exactly as the JS executes it — `payloadFor`'s field set POSTed to
/sdapi/v1/txt2img with `startPolling`-style concurrent /sdapi/v1/progress
polls, `showResult`'s res.images/res.info contract decoded, then the
send-to-img2img handler's init_images round trip (webui_static.py:705-830).

Reference behavior anchor: javascript/progressbar.js + modules/txt2img.py
drive the same POST→poll→gallery loop through gradio.
"""

import base64
import io
import json
import re
import threading
import time
import urllib.request

import numpy as np
import pytest

from fixtures import make_tiny_engine


@pytest.fixture(scope="module")
def live_server():
    from forge_tpu.api.server import create_server
    from forge_tpu.runtime.models import ModelManager

    mm = ModelManager()
    mm.set_engine(make_tiny_engine())
    srv = create_server(mm, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.server_address[1]}{path}"


def _get(srv, path):
    with urllib.request.urlopen(_url(srv, path), timeout=120) as r:
        return r.status, r.read()


def _post(srv, path, body):
    req = urllib.request.Request(
        _url(srv, path), json.dumps(body).encode(),
        {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def test_every_spa_endpoint_is_served(live_server):
    """Every api("...") literal in the SPA JS resolves on the live router."""
    status, html = _get(live_server, "/")
    assert status == 200
    page = html.decode()
    called = set(re.findall(r'api\("(/[^"?]+)"', page))
    called |= {"/sdapi/v1/txt2img", "/sdapi/v1/img2img"}  # api(`/sdapi/v1/${m}`)
    assert len(called) > 20, "SPA endpoint extraction regressed"
    routes = live_server.RequestHandlerClass.api.routes
    served = {p for (_m, p) in routes}
    missing = sorted(c for c in called if c not in served)
    assert not missing, f"SPA calls unserved endpoints: {missing}"
    # methods must match how the JS calls them: api(path) → GET,
    # api(path, body) → POST
    get_calls = set(re.findall(r'api\("(/[^"?]+)"\)', page))
    for p in sorted(get_calls):
        assert ("GET", p) in routes, f"JS GETs {p} but router has no GET"


def test_generate_progress_gallery_send_to_img2img(live_server):
    """The SPA's full txt2img journey, headless."""
    # -- payloadFor("txt2img") field set (webui_static.py:720-737)
    payload = {
        "prompt": "a cat", "negative_prompt": "blurry",
        "sampler_name": "Euler a", "scheduler": "Normal",
        "steps": 3, "cfg_scale": 7.0, "width": 64, "height": 64,
        "batch_size": 1, "n_iter": 1,
        "seed": 42, "subseed": -1, "subseed_strength": 0.0,
        "clip_skip": 1, "styles": [],
    }
    progress_snapshots = []
    stop = threading.Event()

    def poll():  # startPolling(): GET progress every 700 ms during generation
        while not stop.is_set():
            try:
                status, raw = _get(live_server, "/sdapi/v1/progress")
                if status == 200:
                    progress_snapshots.append(json.loads(raw))
            except OSError:
                pass
            time.sleep(0.1)

    poller = threading.Thread(target=poll, daemon=True)
    poller.start()
    try:
        res = _post(live_server, "/sdapi/v1/txt2img", payload)
    finally:
        stop.set()
        poller.join(timeout=5)

    # -- showResult contract (webui_static.py:771-790)
    assert res["images"], "gallery would be empty"
    info = json.loads(res["info"] or "{}")
    assert info.get("infotexts"), "infotext pane would be empty"
    assert "seed" in info
    png = base64.b64decode(res["images"][0])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image

    img = Image.open(io.BytesIO(png))
    assert img.size == (64, 64)
    # progress endpoint answered while the job ran (the SPA's progress bar)
    assert progress_snapshots and all("progress" in p
                                      for p in progress_snapshots)

    # -- send-to-img2img handler: st.imgs[st.sel] becomes init_images[0]
    i2i = {
        "prompt": "a cat, oil painting", "negative_prompt": "",
        "sampler_name": "Euler a", "scheduler": "Normal",
        "steps": 3, "cfg_scale": 7.0, "width": 64, "height": 64,
        "batch_size": 1, "n_iter": 1, "seed": 43, "subseed": -1,
        "subseed_strength": 0.0, "clip_skip": 1, "styles": [],
        "init_images": [res["images"][0]],
        "denoising_strength": 0.6, "inpainting_fill": "original",
        "mask_blur": 4, "inpaint_full_res": False,
    }
    res2 = _post(live_server, "/sdapi/v1/img2img", i2i)
    assert res2["images"]
    png2 = base64.b64decode(res2["images"][0])
    out = np.asarray(Image.open(io.BytesIO(png2)))
    assert out.shape == (64, 64, 3)
    assert not np.array_equal(np.asarray(img), out)


def test_token_counter_like_update_token_counter(live_server):
    """The prompt token counter seam (reference modules/ui.py
    update_token_counter): schedules/AND variants count the worst case,
    extra-network tags are stripped, max rounds to the 75-chunk ceiling."""
    r = _post(live_server, "/sdapi/v1/token-count",
              {"text": "a photo of a cat", "steps": 20})
    assert 0 < r["count"] <= 75 and r["max"] == 75
    # <lora:...> never reaches the text encoder
    tagged = _post(live_server, "/sdapi/v1/token-count",
                   {"text": "a photo of a cat <lora:foo:0.8>", "steps": 20})
    assert tagged["count"] == r["count"]
    # editing schedule counts the longer variant
    sched = _post(live_server, "/sdapi/v1/token-count",
                  {"text": "[a cat:a very fluffy maine coon cat:0.5]",
                   "steps": 20})
    plain = _post(live_server, "/sdapi/v1/token-count",
                  {"text": "a very fluffy maine coon cat", "steps": 20})
    assert sched["count"] == plain["count"]
    # long prompts raise the chunk ceiling
    long = _post(live_server, "/sdapi/v1/token-count",
                 {"text": ", ".join(["masterpiece"] * 90), "steps": 20})
    assert long["count"] > 75 and long["max"] % 75 == 0 \
        and long["max"] >= long["count"]
    # mid-typing garbage must not 500
    bad = _post(live_server, "/sdapi/v1/token-count",
                {"text": "[broken:sched", "steps": 20})
    assert "count" in bad


def test_paste_bindings_parse_and_field_coverage(live_server):
    """Toprow paste seam: parse-infotext returns Title-case params, and every
    form id the SPA's applyInfotext writes exists in the served page."""
    blob = ("an astronaut riding a horse\n"
            "Negative prompt: blurry, low quality\n"
            "Steps: 28, Sampler: DPM++ 2M, Schedule type: Karras, "
            "CFG scale: 6.5, Seed: 1234, Size: 832x1216, Clip skip: 2, "
            "Denoising strength: 0.45, Hires upscale: 2.0, "
            "Hires steps: 12, Hires upscaler: Latent, "
            "Variation seed: 99, Variation seed strength: 0.3")
    p = _post(live_server, "/sdapi/v1/parse-infotext", {"text": blob})["parameters"]
    assert p["Prompt"] == "an astronaut riding a horse"
    assert p["Negative prompt"] == "blurry, low quality"
    assert p["Steps"] == "28" and p["CFG scale"] == "6.5"
    assert p["Size-1"] == "832" or p.get("Size") == "832x1216"
    assert p["Clip skip"] == "2" and p["Hires upscale"] == "2.0"
    # field-id drift check: the ids applyInfotext writes are built by the
    # genPanel template literal, so the served page carries the ${m}-form
    _status, html = _get(live_server, "/")
    page = html.decode()
    for fid in ["prompt", "negative", "steps", "cfg", "seed", "clipskip",
                "width", "height", "sampler", "scheduler", "subseed",
                "substrength", "hr-enable", "hr-scale", "hr-steps",
                "hr-upscaler", "hr-denoise", "hr-model", "refiner",
                "refiner-at", "denoise", "maskblur", "prompt-count",
                "negative-count", "paste"]:
        # direct ids render as id="${m}-steps"; sliders as sliderRow(m+"-cfg"
        assert (f'id="${{m}}-{fid}"' in page
                or f'"-{fid}"' in page), f"form lost field ${{m}}-{fid}"
    # every id applyInfotext targets is also referenced by the JS set() calls
    for key in ["Clip skip", "Variation seed", "Hires upscale",
                "Refiner switch at", "Denoising strength", "Mask blur"]:
        assert key in page, f"applyInfotext lost binding for {key!r}"


def test_png_info_round_trip_like_pnginfo_tab(live_server):
    """The PNG-info tab flow: generated image → /sdapi/v1/png-info →
    parameters string the paste bindings consume."""
    res = _post(live_server, "/sdapi/v1/txt2img", {
        "prompt": "tag test", "steps": 2, "width": 64, "height": 64,
        "seed": 7})
    info = _post(live_server, "/sdapi/v1/png-info",
                 {"image": res["images"][0]})
    assert "tag test" in info.get("info", "")
    assert "Seed: 7" in info["info"]
