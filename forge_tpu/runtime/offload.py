"""Host-offload weight streaming: run models whose weights exceed HBM.

The TPU-native replacement for the reference's CPU-swap machinery
(backend/memory_management.py:456-523 build_module_profile/model_load +
backend/stream.py dual-CUDA-stream mover + backend/operations.py:57-106
per-layer prefetch): parameters live in PINNED HOST memory
(`memory_kind="pinned_host"`) and the XLA latency-hiding scheduler overlaps
the host→HBM copy of layer k+1 with layer k's compute inside the compiled
program — the double-buffered mover, compiler-managed instead of
hand-rolled streams and events.

Offload is a placement decision over pytree leaves, so the "GPU Weights
slider" (reference main_entry.py:160-238) maps to `plan_offload`: given the
HBM budget, choose which leaves stay resident (biggest matmul weights first
— they amortize transfer best) and which stream from host per step.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np


def host_sharding(device=None):
    dev = device or jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")


def device_sharding(device=None):
    dev = device or jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(dev, memory_kind="device")


def fetch_to_device(tree, device=None):
    """In-jit: copy array leaves to device HBM. Used inside the compiled
    denoise step when offload is active. XLA schedules each host→HBM copy
    (copy-start/copy-done pairs around first/last use), overlapping the
    transfer with compute. MEASURED on the v5e (tools/offload_overlap_probe
    .py, 2026-08-20): an 8-layer matmul chain streaming 256 MB of bf16
    weights runs in 45.7 ms vs resident 34.2 ms + fetch-only 41.3 ms
    (6.5 GB/s host→HBM) — 87 % of the smaller leg hidden, i.e. t_streamed ≈
    1.11 × max(compute, transfer) instead of their sum. Leaves already in
    HBM are unaffected (same-space copies are elided)."""
    dsh = device_sharding(device)
    return jax.tree.map(
        lambda l: jax.device_put(l, dsh) if isinstance(l, jax.Array) else l,
        tree)


def supports_host_offload() -> bool:
    """Probe once: does this backend accept pinned_host placements with an
    in-jit fetch into a matmul? (Some PJRT plugins don't.)"""
    global _SUPPORTED
    if _SUPPORTED is None:
        try:
            import jax.numpy as jnp

            w = jax.device_put(jnp.ones((8, 128)), host_sharding())

            def f(w_, x_):
                return x_ @ fetch_to_device(w_).T

            y = jax.jit(f)(w, jnp.ones((4, 128)))
            np.asarray(y)
            _SUPPORTED = True
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED


_SUPPORTED: Optional[bool] = None


def _leaf_bytes(leaf) -> int:
    return int(getattr(leaf, "nbytes", 0) or 0)


def plan_offload(tree, hbm_budget: int) -> Tuple[Any, int, int]:
    """Split a param tree's placement by budget: leaves stay on device until
    the budget is spent (largest-first, so the weights with the best
    compute/transfer ratio stay resident), the rest go to pinned host.

    → (tree with host-placed leaves, resident_bytes, offloaded_bytes)."""
    leaves, treedef = jax.tree.flatten(tree)
    order = sorted(range(len(leaves)), key=lambda i: -_leaf_bytes(leaves[i]))
    resident = [False] * len(leaves)
    spent = 0
    for i in order:
        b = _leaf_bytes(leaves[i])
        if spent + b <= hbm_budget:
            resident[i] = True
            spent += b
    host = host_sharding()
    off_bytes = 0
    out = []
    for i, leaf in enumerate(leaves):
        if resident[i] or not isinstance(leaf, jax.Array):
            out.append(leaf)
        else:
            out.append(jax.device_put(leaf, host))
            off_bytes += _leaf_bytes(leaf)
    return jax.tree.unflatten(treedef, out), spent, off_bytes


def offload_tree_to_host(tree):
    """Everything to pinned host (full streaming — the reference's
    'CPU swap all' low-vram profile)."""
    host = host_sharding()
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, host) if isinstance(leaf, jax.Array) else leaf,
        tree)


def enable_engine_offload(engine, hbm_budget: Optional[int] = None) -> str:
    """Place the engine's UNet under an HBM budget (bytes of weights allowed
    to stay resident). Returns a human-readable summary. The next jit of the
    sampling loop compiles with streaming copies for the host leaves."""
    if not supports_host_offload():
        return "host offload unsupported on this backend"
    if hbm_budget is None:
        from .memory import device_memory

        free = device_memory()["free"]
        hbm_budget = max(free - (4 << 30), 1 << 30)  # leave room for activations
    tree, resident, offloaded = plan_offload(engine.loaded.unet, hbm_budget)
    engine.loaded.unet = tree
    engine._offload_active = True  # sampling loop inserts fetch_to_device
    engine._jit_cache.clear()
    return (f"offload: {resident / 1e9:.2f} GB resident, "
            f"{offloaded / 1e9:.2f} GB streaming from host")
