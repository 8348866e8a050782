"""Extension manager: discovery, metadata, ordering, enable/disable,
config-state snapshots.

Behavioral twin of modules/extensions.py:39-316 (Extension objects with
metadata.ini, git info, canonical names, dependency-aware load ordering) and
modules/config_states.py (snapshot/restore of the extension + options
state). Installation is filesystem-based (drop a directory under
``extensions/``); the reference's git-clone installer is intentionally not a
server capability here — arbitrary remote code fetch is a deployment
decision, so install/update surface as explicit local operations.

Layout per extension:
    extensions/<name>/
        scripts/*.py          -- Script subclasses, auto-discovered
        metadata.ini          -- optional: [Extension] Name=, Requires=
        install.py            -- intentionally NOT executed (no pip in env)
"""

from __future__ import annotations

import configparser
import dataclasses
import json
import os
import re
import subprocess
import time
from typing import Dict, List, Optional

BUILTIN_DIR = "extensions-builtin"
USER_DIR = "extensions"


@dataclasses.dataclass
class Extension:
    name: str
    path: str
    is_builtin: bool = False
    enabled: bool = True
    canonical_name: str = ""
    requires: List[str] = dataclasses.field(default_factory=list)
    commit_hash: str = ""
    branch: str = ""
    remote: str = ""
    version: str = ""

    @property
    def scripts_dir(self) -> str:
        return os.path.join(self.path, "scripts")

    def read_metadata(self) -> None:
        """metadata.ini (reference extensions.py:60-92 ExtensionMetadata)."""
        self.canonical_name = self.name.lower()
        ini = os.path.join(self.path, "metadata.ini")
        if not os.path.exists(ini):
            return
        cfg = configparser.ConfigParser()
        try:
            cfg.read(ini)
            self.canonical_name = cfg.get("Extension", "Name",
                                          fallback=self.name).lower()
            req = cfg.get("Extension", "Requires", fallback="")
            self.requires = [r.strip().lower() for r in req.split(",") if r.strip()]
        except Exception:
            pass

    def read_git_info(self) -> None:
        """Best-effort git identity (reference extensions.py:140-170)."""
        git_dir = os.path.join(self.path, ".git")
        if not os.path.isdir(git_dir):
            return

        def git(*args):
            try:
                return subprocess.run(["git", "-C", self.path, *args],
                                      capture_output=True, text=True,
                                      timeout=5).stdout.strip()
            except Exception:
                return ""

        self.commit_hash = git("rev-parse", "HEAD")
        self.branch = git("rev-parse", "--abbrev-ref", "HEAD")
        self.remote = git("remote", "get-url", "origin")
        self.version = self.commit_hash[:8]


def _disabled_set():
    from .options import opts

    try:
        mode = opts.get("disable_all_extensions")
    except KeyError:
        mode = "none"
    try:
        disabled = set(opts.get("disabled_extensions") or [])
    except KeyError:
        disabled = set()
    return disabled, mode


def list_extensions(base_dirs: Optional[List[str]] = None) -> List[Extension]:
    """Discover + order extensions (reference extensions.py:180-260
    list_extensions with Requires-based topological ordering)."""
    dirs = base_dirs or [BUILTIN_DIR, USER_DIR]
    disabled, mode = _disabled_set()
    found: List[Extension] = []
    for base in dirs:
        if not os.path.isdir(base):
            continue
        builtin = base == BUILTIN_DIR
        for name in sorted(os.listdir(base)):
            path = os.path.join(base, name)
            if not os.path.isdir(path) or name.startswith("."):
                continue
            ext = Extension(name=name, path=path, is_builtin=builtin)
            ext.read_metadata()
            ext.read_git_info()
            if mode == "all" or (mode == "extra" and not builtin) \
                    or name in disabled or ext.canonical_name in disabled:
                ext.enabled = False
            found.append(ext)

    # topological-ish ordering: repeatedly emit extensions whose Requires are met
    by_name = {e.canonical_name: e for e in found}
    ordered: List[Extension] = []
    remaining = list(found)
    while remaining:
        progress = False
        for ext in list(remaining):
            if all(r in {o.canonical_name for o in ordered} or r not in by_name
                   for r in ext.requires):
                ordered.append(ext)
                remaining.remove(ext)
                progress = True
        if not progress:  # cycle — emit the rest in name order
            ordered.extend(remaining)
            break
    return ordered


def load_extension_scripts(runner, base_dirs: Optional[List[str]] = None) -> List[Extension]:
    """Load each enabled extension's scripts/ into a ScriptRunner."""
    exts = list_extensions(base_dirs)
    for ext in exts:
        if ext.enabled and os.path.isdir(ext.scripts_dir):
            runner.load_dir(ext.scripts_dir)
    return exts


# -- config states (modules/config_states.py) --------------------------------


def save_config_state(name: str = "", dirname: str = "config_states") -> str:
    """Snapshot options + extension versions → timestamped JSON."""
    from .options import opts

    os.makedirs(dirname, exist_ok=True)
    created = int(time.time())
    state = {
        "name": name or "Config",
        "created_at": created,
        "settings": opts.dump_registry(),
        "extensions": [dataclasses.asdict(e) for e in list_extensions()],
    }
    # API-supplied name: strip anything path-like so the file always lands
    # inside dirname (no ../ traversal via POST /config_states/save)
    safe = re.sub(r"[^\w.-]", "_", os.path.basename(name or "config")) or "config"
    path = os.path.join(dirname, f"{created}_{safe}.json")
    assert os.path.dirname(os.path.abspath(path)) == os.path.abspath(dirname)
    with open(path, "w", encoding="utf8") as f:
        json.dump(state, f, indent=2, default=str)
    return path


def list_config_states(dirname: str = "config_states") -> List[Dict]:
    out = []
    if not os.path.isdir(dirname):
        return out
    for fname in sorted(os.listdir(dirname), reverse=True):
        if fname.endswith(".json"):
            try:
                with open(os.path.join(dirname, fname), encoding="utf8") as f:
                    st = json.load(f)
                st["filepath"] = os.path.join(dirname, fname)
                out.append(st)
            except Exception:
                continue
    return out


def restore_config_state(path: str) -> None:
    """Restore option VALUES from a snapshot (extension code restore would
    need git — reported, not performed)."""
    from .options import opts

    with open(path, encoding="utf8") as f:
        state = json.load(f)
    for key, info in (state.get("settings") or {}).items():
        if "value" in info:
            try:
                opts.set(key, info["value"], run_onchange=False)
            except Exception:
                pass
