"""SwinIR-in-JAX tests on a tiny synthetic checkpoint shaped like the
official release files (JingyunLiang/SwinIR key space)."""

import numpy as np

import jax.numpy as jnp

from forge_tpu.core.tree import nest
from forge_tpu.models.swinir import (
    _pixel_shuffle,
    _shift_mask,
    _window_partition,
    _window_reverse,
    infer_swinir_meta,
    swinir_apply,
)


def _conv(rng, o, i, k=3):
    return (rng.standard_normal((k, k, i, o)) * (0.3 / np.sqrt(k * k * i))).astype(np.float32)


def _lin(rng, o, i):
    return {"weight": (rng.standard_normal((o, i)) * (0.3 / np.sqrt(i))).astype(np.float32),
            "bias": np.zeros(o, np.float32)}


def _ln(c):
    return {"weight": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}


def _rel_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int64)


def make_tiny_swinir(seed=0, dim=16, heads=2, ws=4, depth=2, n_layers=2, scale=2):
    rng = np.random.default_rng(seed)
    sd = {
        "conv_first.weight": _conv(rng, dim, 3), "conv_first.bias": np.zeros(dim, np.float32),
        "conv_after_body.weight": _conv(rng, dim, dim),
        "conv_after_body.bias": np.zeros(dim, np.float32),
        "conv_before_upsample.0.weight": _conv(rng, dim, dim),
        "conv_before_upsample.0.bias": np.zeros(dim, np.float32),
        "upsample.0.weight": _conv(rng, dim * 4, dim),
        "upsample.0.bias": np.zeros(dim * 4, np.float32),
        "conv_last.weight": _conv(rng, 3, dim), "conv_last.bias": np.zeros(3, np.float32),
    }
    params = nest({k: jnp.asarray(v) for k, v in sd.items()})
    params["norm"] = {k: jnp.asarray(v) for k, v in _ln(dim).items()}
    params["patch_embed"] = {"norm": {k: jnp.asarray(v) for k, v in _ln(dim).items()}}
    params["layers"] = {}
    for i in range(n_layers):
        blocks = {}
        for j in range(depth):
            blocks[str(j)] = {
                "norm1": _ln(dim), "norm2": _ln(dim),
                "attn": {
                    "relative_position_bias_table":
                        jnp.asarray(rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32) * 0.02),
                    "relative_position_index": jnp.asarray(_rel_index(ws)),
                    "qkv": _lin(rng, dim * 3, dim),
                    "proj": _lin(rng, dim, dim),
                },
                "mlp": {"fc1": _lin(rng, dim * 2, dim), "fc2": _lin(rng, dim, dim * 2)},
            }
        params["layers"][str(i)] = {
            "residual_group": {"blocks": blocks},
            "conv": {"weight": jnp.asarray(_conv(rng, dim, dim)),
                     "bias": jnp.zeros(dim, jnp.float32)},
        }
    return params


def test_window_partition_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    win = _window_partition(x, 4)
    assert win.shape == (2 * 2 * 3, 16, 5)
    back = _window_reverse(win, 4, 8, 12)
    assert np.allclose(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region():
    mask = _shift_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert (mask == 0).any() and (mask == -100).any()
    # top-left window is one contiguous region → fully unmasked
    assert (mask[0] == 0).all()


def test_pixel_shuffle():
    x = jnp.arange(1 * 2 * 2 * 8, dtype=jnp.float32).reshape(1, 2, 2, 8)
    y = _pixel_shuffle(x, 2)
    assert y.shape == (1, 4, 4, 2)


def test_swinir_forward_and_meta():
    params = make_tiny_swinir()
    meta = infer_swinir_meta(params)
    assert meta == {"window_size": 4, "heads": 2, "scale": 2}
    img = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 10, 14, 3)), jnp.float32)
    out = swinir_apply(params, img, window_size=4, heads=2, scale=2)
    assert out.shape == (1, 20, 28, 3)  # non-multiple sizes pad internally
    assert np.isfinite(np.asarray(out)).all()


def test_registry_arch_sniffing(tmp_path):
    """A SwinIR-shaped checkpoint on disk routes to the SwinIR arch."""
    import safetensors.numpy

    from forge_tpu.pipeline.upscalers import UpscalerRegistry

    params = make_tiny_swinir()
    flat = {}

    def walk(prefix, node):
        for k, v in node.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(key, v)
            else:
                arr = np.asarray(v)
                if arr.ndim == 4:  # back to torch OIHW on disk
                    arr = arr.transpose(3, 2, 0, 1)
                flat[key] = arr

    walk("", params)
    path = tmp_path / "swinir_tiny_x2.safetensors"
    safetensors.numpy.save_file(flat, str(path))

    reg = UpscalerRegistry(model_dirs={"SwinIR": str(tmp_path)})
    assert "swinir_tiny_x2" in reg.upscalers
    img = (np.random.default_rng(3).uniform(0, 1, (12, 12, 3)) * 255).astype(np.uint8)
    out = reg.get("swinir_tiny_x2").upscale(img, 2)
    assert out.shape == (24, 24, 3)
    assert np.isfinite(out.astype(np.float32)).all()
