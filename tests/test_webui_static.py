"""Structural checks on the bundled SPA (forge_tpu/api/webui_static.py).

No JS runtime is available in CI, so these are static checks: the features
the UI must expose (reference modules/ui.py tabs + javascript/edit-attention.js)
appear in the page, and the script block has balanced delimiters — a cheap
syntax smoke that catches truncated edits.
"""

import re

from forge_tpu.api.webui_static import INDEX_HTML


def _script():
    blocks = re.findall(r"<script>([\s\S]*?)</script>", INDEX_HTML)
    assert blocks, "SPA must carry an inline script"
    return "\n".join(blocks)


def test_tabs_present():
    for tab in ("txt2img", "img2img", "extras", "pnginfo", "settings"):
        assert f'id="tab-{tab}"' in INDEX_HTML, tab


def test_feature_surface():
    # prompt styles UI (reference ui_prompt_styles.py); the id is built
    # from a template literal in genPanel()
    assert 'id="${m}-styles"' in INDEX_HTML
    assert "/sdapi/v1/prompt-styles" in _script()
    # edit-attention hotkey (reference javascript/edit-attention.js)
    assert "editAttention" in _script()
    assert "ArrowUp" in _script()
    # hires/refiner/controlnet sections (template-literal ids)
    for el in ("${m}-hr-enable", "${m}-refiner", "${m}-cn-enable"):
        assert f'id="{el}"' in INDEX_HTML, el
    # extra-options quick controls (reference extra-options-section)
    assert 'id="${m}-extraopts"' in INDEX_HTML
    assert "override_settings" in _script()
    # localization applied on load (reference javascript/localization.js)
    assert "/sdapi/v1/localization" in _script()
    # pressure-aware pointer brush (ForgeCanvas parity) + mobile layout
    assert "onpointerdown" in _script() and "e.pressure" in _script()
    assert "@media (max-width:700px)" in INDEX_HTML


def test_script_delimiters_balanced():
    js = _script()
    # strip string/template/regex literals crudely: remove escaped chars,
    # then quoted spans (good enough for a balance smoke; the SPA avoids
    # unbalanced delimiters inside comments)
    js = re.sub(r"\\.", "", js)
    js = re.sub(r"'[^'\n]*'", "''", js)
    js = re.sub(r'"[^"\n]*"', '""', js)
    js = re.sub(r"`[^`]*`", "``", js)
    js = re.sub(r"/\*[\s\S]*?\*/", "", js)
    js = re.sub(r"(^|[^:])//[^\n]*", r"\1", js)
    for open_c, close_c in ("{}", "()", "[]"):
        assert js.count(open_c) == js.count(close_c), (
            f"unbalanced {open_c}{close_c}: "
            f"{js.count(open_c)} vs {js.count(close_c)}")
