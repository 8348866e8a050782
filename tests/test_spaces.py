"""Forge Spaces lifecycle (runtime/spaces.py): discovery from
space_meta.json dirs, subprocess launch on a free port, terminate."""

import json
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
