"""Every declared callback event has a live fire site, and every Script
lifecycle hook fires during an e2e generation (VERDICT r2 missing #3: an
event that never fires is API surface fiction).

Reference: modules/script_callbacks.py:219-690 (global events),
modules/scripts.py:53-352 (Script lifecycle)."""

import json
import sys
import threading
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, "tests")

from fixtures import make_tiny_engine
from forge_tpu.pipeline.processing import Processing, process_images
from forge_tpu.runtime import scripts as scripts_mod
from forge_tpu.runtime.scripts import EVENTS, Script, ScriptRunner


@pytest.fixture(scope="module")
def engine():
    return make_tiny_engine()


def test_every_declared_event_fires(engine, tmp_path, monkeypatch):
    """One recorder per EVENTS member; drive the surfaces that own each fire
    site; assert the full set fired."""
    fired = {}
    scripts_mod.clear()
    for ev in EVENTS:
        scripts_mod.on(ev, (lambda ev: lambda *a, **k: fired.setdefault(ev, a))(ev))
    # ui_tabs has a collect-signature: contribute one custom tab
    scripts_mod.clear("ui_tabs")
    scripts_mod.on("ui_tabs", lambda: fired.setdefault("ui_tabs", True) and []
                   or [{"id": "t", "title": "T", "html": "<b>hi</b>"}])
    # cfg events contribute jittable hooks; record trace-time execution too
    traced = {}
    scripts_mod.clear("cfg_denoiser")
    scripts_mod.clear("cfg_after_cfg")

    def pre_hook(ec, eu, x, s):
        traced["pre"] = True  # runs at trace time: proves the hook compiled in
        return ec, eu

    def post_hook(x0, ec, eu, x, s):
        traced["post"] = True
        return x0

    def on_denoiser(hp):
        fired["cfg_denoiser"] = True
        hp.pre_cfg_hooks.append(pre_hook)

    def on_after(hp):
        fired["cfg_after_cfg"] = True
        hp.post_cfg_hooks.append(post_hook)

    scripts_mod.on("cfg_denoiser", on_denoiser)
    scripts_mod.on("cfg_denoised", lambda hp: fired.setdefault("cfg_denoised", True))
    scripts_mod.on("cfg_after_cfg", on_after)

    # generation covers before_process + the cfg trio
    p = Processing(prompt="x", seed=1, steps=2, width=32, height=32)
    process_images(engine, p)

    # image save events
    from forge_tpu.pipeline.images import save_image

    save_image(np.zeros((16, 16, 3), np.uint8), outdir=str(tmp_path), infotext="t")

    # infotext parse event
    from forge_tpu.pipeline.infotext import parse_generation_parameters

    parse_generation_parameters("cat\nSteps: 4, Sampler: Euler a, Seed: 5")

    # model_loaded via the manager
    from forge_tpu.runtime.models import ModelManager

    mm = ModelManager()
    mm.set_engine(engine)

    # server lifecycle: app_started + ui_tabs at create, script_unloaded when
    # the serve loop exits
    from forge_tpu.api.server import serve

    t = threading.Thread(target=serve, args=(mm, "127.0.0.1", 7893), daemon=True)
    t.start()
    for _ in range(100):
        try:
            req = urllib.request.Request("http://127.0.0.1:7893/sdapi/v1/server-stop",
                                         data=b"{}", headers={"Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=5)
            break
        except Exception:
            import time

            time.sleep(0.1)
    t.join(timeout=10)
    assert not t.is_alive()

    missing = [ev for ev in EVENTS if ev not in fired]
    assert not missing, f"events with no live fire site: {missing}"
    assert traced == {"pre": True, "post": True}, "contributed cfg hooks not compiled in"
    scripts_mod.clear()


def test_ui_tabs_route(engine):
    scripts_mod.clear()
    scripts_mod.on("ui_tabs", lambda: [{"id": "x", "title": "X", "html": "<i>x</i>"}])
    from forge_tpu.api.server import create_server
    from forge_tpu.runtime.models import ModelManager

    mm = ModelManager()
    mm.set_engine(engine)
    srv = create_server(mm, "127.0.0.1", 7894)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        out = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:7894/sdapi/v1/ui-tabs", timeout=5).read())
        assert out == [{"id": "x", "title": "X", "html": "<i>x</i>"}]
    finally:
        srv.shutdown()
        scripts_mod.clear()


class _Recorder(Script):
    name = "recorder"
    alwayson = True

    def __init__(self):
        self.calls = []

    def _rec(self, name):
        self.calls.append(name)

    def setup(self, p): self._rec("setup")
    def before_process(self, p): self._rec("before_process")
    def process(self, p): self._rec("process")
    def before_process_batch(self, p, **kw): self._rec("before_process_batch")
    def process_batch(self, p, **kw): self._rec("process_batch")
    def after_extra_networks_activate(self, p, **kw): self._rec("after_extra_networks_activate")
    def process_before_every_sampling(self, p, **kw): self._rec("process_before_every_sampling")
    def before_process_init_images(self, p, **kw): self._rec("before_process_init_images")
    def before_hr(self, p): self._rec("before_hr")
    def on_mask_blend(self, p, blended, **kw): self._rec("on_mask_blend"); return blended
    def postprocess_batch(self, p, images, **kw): self._rec("postprocess_batch"); return images
    def postprocess_batch_list(self, p, images, **kw): self._rec("postprocess_batch_list"); return images
    def postprocess_image(self, p, image, **kw): self._rec("postprocess_image"); return image
    def postprocess_image_after_composite(self, p, image, **kw):
        self._rec("postprocess_image_after_composite"); return image
    def postprocess(self, p, processed): self._rec("postprocess")


def test_all_script_hooks_fire(engine):
    rec = _Recorder()
    runner = ScriptRunner()
    runner.register(rec)

    # hires txt2img covers before_hr
    p = Processing(prompt="x", seed=1, steps=2, width=32, height=32,
                   enable_hr=True, hr_scale=2.0, scripts=runner)
    process_images(engine, p)
    # inpaint img2img covers init-images / mask-blend / composite hooks
    init = np.full((32, 32, 3), 128, np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    p2 = Processing(prompt="x", seed=1, steps=2, width=32, height=32,
                    init_images=[init], inpaint_mask=mask, scripts=runner)
    process_images(engine, p2)

    expected = {
        "setup", "before_process", "process", "before_process_batch",
        "process_batch", "after_extra_networks_activate",
        "process_before_every_sampling", "before_process_init_images",
        "before_hr", "on_mask_blend", "postprocess_batch",
        "postprocess_batch_list", "postprocess_image",
        "postprocess_image_after_composite", "postprocess",
    }
    missing = expected - set(rec.calls)
    assert not missing, f"script hooks never called: {missing}"


def test_postprocess_batch_list_can_mutate(engine):
    class Doubler(Script):
        name = "doubler"

        def postprocess_batch_list(self, p, images, **kw):
            return images + images  # duplicate every image

    runner = ScriptRunner()
    runner.register(Doubler())
    p = Processing(prompt="x", seed=1, steps=2, width=32, height=32, scripts=runner)
    r = process_images(engine, p)
    assert len(r.images) == 2
    assert len(r.infotexts) == 2
