"""Content digests for jit-cache keys.

Hook manifests and ControlNet attachments are *closed over* by the compiled
sampling loop, so the executable cache must key on their content, not their
object identity (an `id()` key recompiles on every request that rebuilds the
manifest, and — worse — two different objects reusing one id would silently
return stale compiled closures). This walker produces a stable digest of a
manifest: plain data is hashed by value, callables by code identity plus
their closure constants, arrays by content (small) or an explicit `digest`
attribute (large, set at load time).

Reference analog: forge_loading_parameters hashing in modules/sd_models.py
and the (filename, strength, online) patch keys of backend/patcher/base.py:91.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
from typing import Any

import numpy as np

_SMALL_ARRAY = 65536  # bytes: hash content below this, sample above


def manifest_digest(obj: Any) -> str:
    h = hashlib.sha256()
    _update(h, obj, depth=0)
    return h.hexdigest()[:16]


def _update(h, obj: Any, depth: int) -> None:
    if depth > 24:
        h.update(b"<deep>")
        return
    if obj is None or isinstance(obj, (bool, int, float, str, bytes)):
        h.update(repr(obj).encode())
        return
    if isinstance(obj, dict):
        h.update(b"{")
        for k in sorted(obj, key=repr):
            _update(h, k, depth + 1)
            _update(h, obj[k], depth + 1)
        h.update(b"}")
        return
    if isinstance(obj, (list, tuple, set, frozenset)):
        h.update(type(obj).__name__.encode())
        items = sorted(obj, key=repr) if isinstance(obj, (set, frozenset)) else obj
        for v in items:
            _update(h, v, depth + 1)
        return
    # explicit digest wins (set at load time for big param trees)
    explicit = getattr(obj, "digest", None)
    if isinstance(explicit, str) and explicit:
        h.update(b"digest:" + explicit.encode())
        # still mix in the cheap non-array fields of dataclasses (strength...)
        if dataclasses.is_dataclass(obj):
            for f in dataclasses.fields(obj):
                v = getattr(obj, f.name)
                if isinstance(v, (bool, int, float, str)) or v is None:
                    _update(h, (f.name, v), depth + 1)
        return
    if isinstance(obj, np.ndarray):
        _hash_array(h, obj)
        return
    if _is_jax_array(obj):
        _hash_array(h, np.asarray(obj) if obj.size * obj.dtype.itemsize <= _SMALL_ARRAY else obj)
        return
    if isinstance(obj, functools.partial):
        h.update(b"partial")
        _update(h, obj.func, depth + 1)
        _update(h, obj.args, depth + 1)
        _update(h, obj.keywords, depth + 1)
        return
    if callable(obj):
        _hash_callable(h, obj, depth)
        return
    if dataclasses.is_dataclass(obj):
        h.update(type(obj).__qualname__.encode())
        for f in dataclasses.fields(obj):
            _update(h, (f.name, getattr(obj, f.name)), depth + 1)
        return
    # generic object: type + public attrs that look like config
    h.update(type(obj).__qualname__.encode())
    d = getattr(obj, "__dict__", None)
    if d:
        _update(h, {k: v for k, v in d.items() if not k.startswith("_")}, depth + 1)


def _is_jax_array(obj) -> bool:
    try:
        import jax

        return isinstance(obj, jax.Array)
    except Exception:
        return False


def _hash_array(h, arr) -> None:
    h.update(f"arr:{tuple(arr.shape)}:{arr.dtype}".encode())
    nbytes = int(np.prod(arr.shape or (1,))) * arr.dtype.itemsize
    if isinstance(arr, np.ndarray) and nbytes <= _SMALL_ARRAY:
        h.update(np.ascontiguousarray(arr).tobytes())
    elif isinstance(arr, np.ndarray):
        flat = arr.ravel()
        h.update(np.ascontiguousarray(flat[:2048]).tobytes())
        h.update(np.ascontiguousarray(flat[-2048:]).tobytes())
    else:
        # device array too big to fetch: sample the head (one small transfer)
        try:
            h.update(np.asarray(arr.ravel()[:512]).tobytes())
        except Exception:
            h.update(b"<device>")


def _hash_callable(h, fn, depth: int) -> None:
    code = getattr(fn, "__code__", None)
    h.update(f"fn:{getattr(fn, '__module__', '')}.{getattr(fn, '__qualname__', repr(fn))}".encode())
    if code is not None:
        h.update(code.co_code)
        for const in code.co_consts:
            if isinstance(const, (bool, int, float, str, bytes)) or const is None:
                h.update(repr(const).encode())
    closure = getattr(fn, "__closure__", None)
    if closure:
        for cell in closure:
            try:
                _update(h, cell.cell_contents, depth + 1)
            except ValueError:  # empty cell
                h.update(b"<empty>")
    defaults = getattr(fn, "__defaults__", None)
    if defaults:
        _update(h, defaults, depth + 1)
    # bound methods: include the receiver's config
    self_obj = getattr(fn, "__self__", None)
    if self_obj is not None and depth < 8:
        _update(h, self_obj, depth + 1)
