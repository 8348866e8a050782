"""Forge Spaces: self-contained sub-apps launched beside the main server.

The reference (modules_forge/forge_space.py, extensions-builtin/forge_space_*)
discovers extension folders carrying `space_meta.json`, shows an
install/launch/terminate card per space, and runs each space's gradio app in
its own process on a free port. This environment has no egress, so "install"
(a HuggingFace snapshot download, forge_space.py:109-131) reduces to a local
asset check; launch/terminate keep the reference semantics: one subprocess
per space, own port, tracked URL.

Space contract: a directory containing
  space_meta.json   {"title": ..., "tag": ...}
  forge_app.py      run as `python forge_app.py --host H --port P`; must
                    serve HTTP on (H, P) until terminated.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from typing import Dict, List, Optional


def find_free_port(host: str = "127.0.0.1", start_port: int = 7870) -> int:
    port = start_port
    while True:
        with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
            try:
                s.bind((host, port))
                return port
            except OSError:
                port += 1


class ForgeSpace:
    def __init__(self, root_path: str, meta: Dict):
        self.root_path = root_path
        self.name = os.path.basename(root_path)
        self.title = meta.get("title") or self.name
        self.tag = meta.get("tag", "")
        self.meta = meta
        self.proc: Optional[subprocess.Popen] = None
        self.url: Optional[str] = None

    @property
    def installed(self) -> bool:
        return os.path.exists(os.path.join(self.root_path, "forge_app.py"))

    @property
    def running(self) -> bool:
        return self.proc is not None and self.proc.poll() is None

    def launch(self, host: str = "127.0.0.1", timeout: float = 60.0,
               env: Optional[Dict[str, str]] = None) -> str:
        if self.running:
            return self.url
        if not self.installed:
            raise RuntimeError(f"space {self.name!r} has no forge_app.py")
        port = find_free_port(host)
        # absolute script path: the child's cwd IS root_path, so a relative
        # path would resolve inside itself and exit 2 (file not found)
        app = os.path.abspath(os.path.join(self.root_path, "forge_app.py"))
        self.proc = subprocess.Popen(
            [sys.executable, app, "--host", host, "--port", str(port)],
            cwd=self.root_path,
            env=env,  # None = inherit; tests pass a scrubbed env so the
            # child cannot hang on an accelerator plugin whose transport
            # is down (the CPU suite must never depend on the TPU tunnel)
        )
        self.url = f"http://{host}:{port}"
        # wait for the app to accept connections (or die early)
        deadline = time.time() + timeout
        while time.time() < deadline:
            if self.proc.poll() is not None:
                raise RuntimeError(
                    f"space {self.name!r} exited with {self.proc.returncode}")
            try:
                with socket.create_connection((host, port), timeout=0.5):
                    return self.url
            except OSError:
                time.sleep(0.2)
        self.terminate()
        raise TimeoutError(f"space {self.name!r} did not open {self.url}")

    def terminate(self):
        if self.proc is not None and self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait()
        self.proc = None
        self.url = None

    def info(self) -> Dict:
        return {"name": self.name, "title": self.title, "tag": self.tag,
                "installed": self.installed, "running": self.running,
                "url": self.url}


class SpaceManager:
    """Discovery + lifecycle over extension directories (the top-level
    `spaces.py` + forge_space.spaces list equivalent)."""

    def __init__(self, ext_dirs: Optional[List[str]] = None):
        self.spaces: Dict[str, ForgeSpace] = {}
        for d in ext_dirs or []:
            self.discover(d)

    def discover(self, ext_dir: str):
        if not os.path.isdir(ext_dir):
            return
        for name in sorted(os.listdir(ext_dir)):
            meta_path = os.path.join(ext_dir, name, "space_meta.json")
            if os.path.exists(meta_path):
                try:
                    with open(meta_path) as f:
                        meta = json.load(f)
                except Exception:
                    meta = {}
                self.spaces[name] = ForgeSpace(os.path.join(ext_dir, name), meta)

    def list(self) -> List[Dict]:
        return [s.info() for s in self.spaces.values()]

    def launch(self, name: str, host: str = "127.0.0.1", timeout: float = 60.0,
               env: Optional[Dict[str, str]] = None) -> str:
        return self.spaces[name].launch(host, timeout=timeout, env=env)

    def terminate(self, name: str):
        self.spaces[name].terminate()

    def terminate_all(self):
        for s in self.spaces.values():
            s.terminate()
