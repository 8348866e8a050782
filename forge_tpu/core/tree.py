"""Parameter-tree utilities.

Checkpoints arrive as flat `{dotted.key: array}` state dicts (torch naming).
We keep that addressing scheme as the canonical parameter identity — it is the
ABI that LoRA files, ControlNets and extensions use to name weights (the
reference's ModelPatcher keys patches by the same dotted names,
backend/patcher/base.py:91) — but store parameters as a nested pytree so JAX
transformations (jit donation, sharding, weight-merge patches) treat them as
ordinary pytrees.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Mapping, Tuple

import jax
import numpy as np


def nest(flat: Mapping[str, Any], sep: str = ".") -> Dict[str, Any]:
    """{'a.b.c': x} → {'a': {'b': {'c': x}}}."""
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        node = out
        parts = key.split(sep)
        for part in parts[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise ValueError(f"key {key!r} collides with a leaf at {part!r}")
        node[parts[-1]] = value
    return out


def flatten(tree: Mapping[str, Any], sep: str = ".", prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, value in tree.items():
        path = f"{prefix}{sep}{key}" if prefix else str(key)
        if isinstance(value, dict):
            out.update(flatten(value, sep, path))
        else:
            out[path] = value
    return out


def get_path(tree: Mapping[str, Any], key: str, sep: str = ".", default=None):
    node: Any = tree
    for part in key.split(sep):
        if not isinstance(node, Mapping) or part not in node:
            return default
        node = node[part]
    return node


def set_path(tree: Dict[str, Any], key: str, value: Any, sep: str = ".") -> None:
    parts = key.split(sep)
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def iter_leaves(tree: Mapping[str, Any], prefix: str = "") -> Iterator[Tuple[str, Any]]:
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else str(key)
        if isinstance(value, dict):
            yield from iter_leaves(value, path)
        else:
            yield path, value


def map_leaves(fn: Callable[[str, Any], Any], tree: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Like jax.tree.map but the callback also receives the dotted path."""
    out: Dict[str, Any] = {}
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else str(key)
        if isinstance(value, dict):
            out[key] = map_leaves(fn, value, path)
        else:
            out[key] = fn(path, value)
    return out


def tree_bytes(tree: Any) -> int:
    total = 0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "nbytes"):
            total += leaf.nbytes
        elif hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += leaf.size * np.dtype(leaf.dtype).itemsize
    return total
