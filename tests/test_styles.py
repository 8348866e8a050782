"""Prompt styles: apply/extract round-trip, csv persistence, API routes,
and CLI-flag server gates (reference modules/styles.py + cmd_args flags)."""

import json
import os
import sys
import threading
import urllib.error
import urllib.request

import pytest

sys.path.insert(0, "tests")

from forge_tpu.runtime.styles import (PromptStyle, StyleDatabase,
                                      apply_styles_to_prompt,
                                      extract_style_text_from_prompt)

PORT = 7894


# -- pure functions (modules/styles.py:17-77 semantics) -----------------------


def test_apply_append_and_placeholder():
    assert apply_styles_to_prompt("1girl", ["masterpiece"]) == "1girl, masterpiece"
    assert apply_styles_to_prompt("1girl", ["best, {prompt}, quality"]) == \
        "best, 1girl, quality"
    assert apply_styles_to_prompt("", ["masterpiece"]) == "masterpiece"
    assert apply_styles_to_prompt("cat", [""]) == "cat"


def test_extract_inverts_apply():
    # the reference's own doctable (modules/styles.py:33-38)
    assert extract_style_text_from_prompt(
        "masterpiece", "1girl, art by greg, masterpiece") == (True, "1girl, art by greg")
    assert extract_style_text_from_prompt(
        "masterpiece, {prompt}", "masterpiece, 1girl, art by greg") == (True, "1girl, art by greg")
    ok, kept = extract_style_text_from_prompt(
        "masterpiece, {prompt}", "exquisite, 1girl, art by greg")
    assert not ok and kept == "exquisite, 1girl, art by greg"


def test_database_roundtrip(tmp_path):
    csv_path = str(tmp_path / "styles.csv")
    db = StyleDatabase([csv_path])
    db.styles["anime"] = PromptStyle("anime", "anime style, {prompt}", "photo")
    db.styles["crisp"] = PromptStyle("crisp", "sharp focus", "blurry")
    db.save()
    assert os.path.exists(csv_path)

    db2 = StyleDatabase([csv_path])
    assert set(db2.styles) == {"anime", "crisp"}
    pos = db2.apply_styles_to_prompt("1cat", ["anime", "crisp"])
    neg = db2.apply_negative_styles_to_prompt("ugly", ["anime", "crisp"])
    assert pos == "anime style, 1cat, sharp focus"
    assert neg == "ugly, photo, blurry"

    found, bare_pos, bare_neg = db2.extract_styles_from_prompt(pos, neg)
    assert found == ["anime", "crisp"]
    assert bare_pos == "1cat"
    assert bare_neg == "ugly"


def test_legacy_text_column(tmp_path):
    p = tmp_path / "styles.csv"
    p.write_text("name,text\nold,vintage look\n", encoding="utf-8")
    db = StyleDatabase([str(p)])
    assert db.styles["old"].prompt == "vintage look"


def test_processing_applies_styles(monkeypatch, tmp_path):
    """Processing.styles expands through the StyleDatabase before encoding
    (reference processing.py:414)."""
    from forge_tpu.runtime import styles as styles_mod

    db = StyleDatabase([str(tmp_path / "s.csv")])
    db.styles["boost"] = PromptStyle("boost", "ultra quality", "lowres")
    monkeypatch.setattr(styles_mod, "prompt_styles", db)

    from fixtures import make_tiny_engine
    from forge_tpu.pipeline.processing import Processing, process_images

    p = Processing(prompt="a cat", negative_prompt="dog", styles=["boost"],
                   steps=1, width=32, height=32, seed=3,
                   do_not_save_samples=True, do_not_save_grid=True)
    result = process_images(make_tiny_engine(), p)
    assert p.prompt == "a cat, ultra quality"
    assert p.negative_prompt == "dog, lowres"
    assert "a cat, ultra quality" in result.infotexts[0]


# -- API routes + flag gates --------------------------------------------------


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from fixtures import make_tiny_engine
    from forge_tpu.api.server import create_server
    from forge_tpu.runtime import styles as styles_mod
    from forge_tpu.runtime.models import ModelManager

    csv_path = str(tmp_path_factory.mktemp("styles") / "styles.csv")
    styles_mod.prompt_styles = StyleDatabase([csv_path])
    mm = ModelManager()
    mm.set_engine(make_tiny_engine())
    srv = create_server(mm, "127.0.0.1", PORT)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _get(path):
    return json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{PORT}{path}", timeout=60).read())


def _post(path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}", json.dumps(body).encode(),
        {"Content-Type": "application/json"})
    return json.loads(urllib.request.urlopen(req, timeout=60).read())


def test_style_api_roundtrip(server):
    _post("/sdapi/v1/prompt-styles", {"name": "api-style",
                                      "prompt": "neon, {prompt}",
                                      "negative_prompt": "dull"})
    listed = _get("/sdapi/v1/prompt-styles")
    assert {"name": "api-style", "prompt": "neon, {prompt}",
            "negative_prompt": "dull"} in listed
    _post("/sdapi/v1/refresh-prompt-styles", {})
    assert any(s["name"] == "api-style"
               for s in _get("/sdapi/v1/prompt-styles"))
    _post("/sdapi/v1/prompt-styles", {"name": "api-style", "delete": True})
    assert not any(s["name"] == "api-style"
                   for s in _get("/sdapi/v1/prompt-styles"))


def test_txt2img_styles_param(server):
    from forge_tpu.runtime.styles import prompt_styles

    prompt_styles.styles["req"] = PromptStyle("req", "stylish", "")
    out = _post("/sdapi/v1/txt2img", {
        "prompt": "a cat", "styles": ["req"], "seed": 5, "steps": 1,
        "width": 32, "height": 32, "sampler_name": "Euler"})
    info = json.loads(out["info"])
    assert "a cat, stylish" in info["infotexts"][0]


def _expect_status(path, body, status):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        json.dumps(body).encode() if body is not None else None,
        {"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == status


def test_flag_gates(server):
    """--nowebui, --freeze-settings, --api-server-stop=False,
    --freeze-specific-settings (webui.py flag audit)."""
    from forge_tpu.api.server import CMD_FLAGS

    try:
        CMD_FLAGS["nowebui"] = True
        _expect_status("/", None, 404)
        CMD_FLAGS["freeze_settings"] = True
        _expect_status("/sdapi/v1/options", {"CLIP_stop_at_last_layers": 2}, 403)
        CMD_FLAGS["freeze_settings"] = False
        CMD_FLAGS["freeze_specific_settings"] = "CLIP_stop_at_last_layers"
        _expect_status("/sdapi/v1/options", {"CLIP_stop_at_last_layers": 2}, 403)
        _post("/sdapi/v1/options", {"samples_format": "png"})  # others still ok
        CMD_FLAGS["api_server_stop"] = False
        _expect_status("/sdapi/v1/server-stop", {}, 404)
    finally:
        for k in ("nowebui", "freeze_settings", "freeze_specific_settings",
                  "api_server_stop"):
            CMD_FLAGS.pop(k, None)


def test_infotext_style_extraction(server, monkeypatch):
    """Pasted infotext re-expresses applied styles as selections
    (infotext_utils.py:318-333, infotext_styles option)."""
    from forge_tpu.pipeline.infotext import infotext_to_processing_args
    from forge_tpu.runtime.styles import prompt_styles

    prompt_styles.styles["neo"] = PromptStyle("neo", "neon glow", "flat")
    text = ("a dog, neon glow\nNegative prompt: bad, flat\n"
            "Steps: 4, Sampler: Euler, CFG scale: 7.0, Seed: 1, Size: 64x64")
    args = infotext_to_processing_args(text)
    assert args["styles"] == ["neo"]
    assert args["prompt"] == "a dog"
    assert args["negative_prompt"] == "bad"
