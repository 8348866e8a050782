"""Host-offload weight streaming tests (runtime/offload.py): placement
planning is backend-independent; the jit-with-pinned-host path is probed and
skipped where the backend lacks memory-kind support (CPU test backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from forge_tpu.runtime.offload import (
    plan_offload,
    supports_host_offload,
)


def test_plan_offload_budget_split():
    tree = {
        "big": jnp.ones((512, 512), jnp.float32),      # 1 MiB
        "mid": jnp.ones((256, 256), jnp.float32),      # 256 KiB
        "small": jnp.ones((16, 16), jnp.float32),      # 1 KiB
        "meta": "not-an-array",
    }
    budget = 512 * 512 * 4 + 1024  # big + small fit, mid doesn't
    out, resident, offloaded = plan_offload(tree, budget)
    assert resident == 512 * 512 * 4 + 16 * 16 * 4
    assert offloaded == 256 * 256 * 4
    assert out["meta"] == "not-an-array"
    # structure and values preserved regardless of placement
    assert np.allclose(np.asarray(out["mid"]), 1.0)


def test_plan_offload_zero_budget_offloads_all():
    tree = {"w": jnp.ones((64, 64))}
    out, resident, offloaded = plan_offload(tree, 0)
    assert resident == 0 and offloaded == 64 * 64 * 4


def test_offloaded_compute_matches_resident():
    """Numerical equivalence: a jit over host-placed weights produces the
    same result as device-resident weights (when the backend supports it)."""
    if not supports_host_offload():
        pytest.skip("backend lacks pinned_host memory kind")
    from forge_tpu.runtime.offload import offload_tree_to_host

    from forge_tpu.runtime.offload import fetch_to_device, offload_tree_to_host

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
    fn = jax.jit(lambda w_, x_: x_ @ fetch_to_device(w_).T)
    ref = np.asarray(fn(w, x))
    w_host = offload_tree_to_host({"w": w})["w"]
    out = np.asarray(fn(w_host, x))
    assert np.allclose(out, ref)


def test_engine_offload_api():
    """enable_host_offload reports clearly on unsupported backends and never
    corrupts the param tree."""
    import sys

    sys.path.insert(0, "tests")
    from fixtures import make_tiny_engine

    eng = make_tiny_engine()
    before = jax.tree.leaves(eng.loaded.unet)[0]
    msg = eng.enable_host_offload()
    assert isinstance(msg, str) and msg
    after = jax.tree.leaves(eng.loaded.unet)[0]
    assert before.shape == after.shape


def test_offloaded_generation_matches_resident():
    """Full txt2img with fully-offloaded UNet weights ≡ device-resident run
    (bit-identical: offload is a placement decision, not a numeric one)."""
    if not supports_host_offload():
        pytest.skip("backend lacks pinned_host memory kind")
    import sys

    sys.path.insert(0, "tests")
    from fixtures import make_tiny_engine

    from forge_tpu.pipeline.processing import Processing, process_images

    def _p():
        return Processing(prompt="a cat", seed=7, steps=3, width=32, height=32,
                          cfg_scale=7.0, sampler_name="Euler")

    eng = make_tiny_engine()
    ref = process_images(eng, _p()).images[0]
    msg = eng.enable_host_offload(hbm_budget=0)  # stream everything
    assert "streaming from host" in msg
    out = process_images(eng, _p()).images[0]
    # ±1 LSB: different executables (fetch-wrapped vs plain); a stale
    # cross-host persistent-cache entry can shift fma ordering
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
