"""packed_device_put / constant_value: the grouped-upload checkpoint path.

Covers the round-5 load-path behaviors: order/dtype/value preservation
through group stacking, permuted-view folding, and device-side constant
materialization (no host transfer for constant leaves — the reference has
no analog; its loads are local-disk mmap, backend/utils.py:22)."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.state_dict import (constant_value, packed_device_put,
                                       as_device_tree)

BIG = (257, 256)  # 65,792 elements: above the constant-fold threshold


def test_constant_value_detection():
    assert constant_value(np.zeros(BIG, np.float32)) == 0
    assert constant_value(np.full(BIG, 7, np.uint8)) == 7
    a = np.zeros(BIG, np.float32)
    a[-1, -1] = 1
    assert constant_value(a) is None
    assert constant_value(np.zeros((64,), np.float32)) is None  # too small
    assert constant_value(np.full(BIG, np.nan, np.float32)) is None


def test_packed_put_mixed_constants_preserve_order_and_values():
    rng = np.random.default_rng(0)
    arrays = [rng.standard_normal(BIG).astype(np.float32),
              np.zeros(BIG, np.float32),
              np.full(BIG, 3.5, np.float32),
              rng.standard_normal((4, 4)).astype(np.float32)]
    out = packed_device_put(arrays)
    for got, want in zip(out, arrays):
        np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)


def test_packed_put_constant_dtype_cast():
    out = packed_device_put([np.zeros(BIG, np.float32)], [jnp.bfloat16])
    assert out[0].dtype == jnp.bfloat16
    assert out[0].shape == BIG


def test_packed_put_many_leaves_grouped_path():
    # ≥48 leaves exercises the group-stack + unpack-program path, with a
    # transposed view thrown in (the permutation must fold and re-apply)
    rng = np.random.default_rng(1)
    arrays = [rng.standard_normal((6, 8)).astype(np.float32)
              for _ in range(50)]
    arrays[7] = np.ascontiguousarray(arrays[7].T).T  # C-contig again
    arrays[9] = rng.standard_normal((8, 6)).astype(np.float32).T  # F-order view
    out = packed_device_put(arrays)
    for got, want in zip(out, arrays):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_as_device_tree_roundtrip():
    rng = np.random.default_rng(2)
    tree = {"a": {"w": rng.standard_normal((5, 5)).astype(np.float32)},
            "b": [np.zeros(BIG, np.float32), np.arange(10, dtype=np.int64)],
            "s": "not-an-array"}
    out = as_device_tree(tree, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out["a"]["w"]), tree["a"]["w"])
    assert np.asarray(out["b"][0]).sum() == 0
    assert out["b"][1].dtype == jnp.int32  # x64 demotion preserved
    assert out["s"] == "not-an-array"
