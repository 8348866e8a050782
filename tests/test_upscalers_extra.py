"""DAT / HAT / SCUNet ports on tiny synthetic checkpoints shaped like the
official release key spaces, plus the conv_transpose torch oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.tree import nest


def _conv(rng, o, i, k=3):
    return (rng.standard_normal((k, k, i, o)) * (0.3 / np.sqrt(k * k * i))).astype(np.float32)


def _lin(rng, o, i):
    return {"weight": (rng.standard_normal((o, i)) * (0.3 / np.sqrt(i))).astype(np.float32),
            "bias": np.zeros(o, np.float32)}


def _ln(c):
    return {"weight": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}


def _bn(c):
    return {"weight": np.ones(c, np.float32), "bias": np.zeros(c, np.float32),
            "running_mean": np.zeros(c, np.float32),
            "running_var": np.ones(c, np.float32)}


def _cw(rng, o, i, k):  # conv weight only (no bias), HWIO
    return {"weight": (rng.standard_normal((k, k, i, o)) * (0.3 / np.sqrt(k * k * i))).astype(np.float32)}


def _cwb(rng, o, i, k):
    d = _cw(rng, o, i, k)
    d["bias"] = np.zeros(o, np.float32)
    return d


def test_conv2d_transpose_torch_oracle():
    torch = pytest.importorskip("torch")
    from forge_tpu.ops import nn

    rng = np.random.default_rng(0)
    for (i, o, k, s, p) in [(8, 6, 2, 2, 0), (8, 6, 3, 2, 1)]:
        x = rng.standard_normal((1, 5, 4, i)).astype(np.float32)
        w = rng.standard_normal((i, o, k, k)).astype(np.float32)  # torch [I,O,kh,kw]
        b = rng.standard_normal((o,)).astype(np.float32)
        ref = torch.nn.functional.conv_transpose2d(
            torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w),
            torch.tensor(b), stride=s, padding=p).permute(0, 2, 3, 1).numpy()
        # the loader's generic 4-d transform: (a,b,kh,kw) → (kh,kw,b,a)
        pj = {"weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
              "bias": jnp.asarray(b)}
        out = np.asarray(nn.conv2d_transpose(jnp.asarray(x), pj, stride=s, padding=p))
        assert out.shape == ref.shape
        assert np.abs(out - ref).max() < 1e-4, (k, s, p)


# ---------------------------------------------------------------------------
# SCUNet


def make_tiny_scunet(seed=0, dim=8, head_dim=2):
    rng = np.random.default_rng(seed)

    def ctb(channels):
        half = channels // 2
        heads = half // head_dim
        return {
            "conv1_1": _cwb(rng, channels, channels, 1),
            "conv1_2": _cwb(rng, channels, channels, 1),
            "conv_block": {"0": _cw(rng, half, half, 3), "2": _cw(rng, half, half, 3)},
            "trans_block": {
                "ln1": _ln(half), "ln2": _ln(half),
                "msa": {
                    "embedding_layer": _lin(rng, 3 * half, half),
                    "linear": _lin(rng, half, half),
                    "relative_position_params":
                        (rng.standard_normal((15 * 15, heads)) * 0.02).astype(np.float32),
                },
                "mlp": {"0": _lin(rng, 2 * half, half), "2": _lin(rng, half, 2 * half)},
            },
        }

    def tconv(o, i):  # ConvTranspose2d [I,O,2,2] → generic transform [2,2,O,I]
        w = (rng.standard_normal((i, o, 2, 2)) * 0.2).astype(np.float32)
        return {"weight": np.transpose(w, (2, 3, 1, 0))}

    params = {
        "m_head": {"0": _cw(rng, dim, 3, 3)},
        "m_down1": {"0": ctb(dim), "1": _cw(rng, 2 * dim, dim, 2)},
        "m_down2": {"0": ctb(2 * dim), "1": _cw(rng, 4 * dim, 2 * dim, 2)},
        "m_down3": {"0": ctb(4 * dim), "1": _cw(rng, 8 * dim, 4 * dim, 2)},
        "m_body": {"0": ctb(8 * dim)},
        "m_up3": {"0": tconv(4 * dim, 8 * dim), "1": ctb(4 * dim)},
        "m_up2": {"0": tconv(2 * dim, 4 * dim), "1": ctb(2 * dim)},
        "m_up1": {"0": tconv(dim, 2 * dim), "1": ctb(dim)},
        "m_tail": {"0": _cw(rng, 3, dim, 3)},
    }
    return params


def test_scunet_forward():
    from forge_tpu.models.scunet import scunet_apply

    params = make_tiny_scunet()
    img = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 20, 28, 3)), jnp.float32)
    out = scunet_apply(params, img, head_dim=2)
    assert out.shape == (1, 20, 28, 3)  # scale-1 denoiser
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# HAT


def make_tiny_hat(seed=0, dim=16, heads=2, ws=4, depth=2, scale=2):
    rng = np.random.default_rng(seed)
    owin = int(0.5 * ws) + ws

    def hab():
        return {
            "norm1": _ln(dim), "norm2": _ln(dim),
            "attn": {
                "relative_position_bias_table":
                    (rng.standard_normal(((2 * ws - 1) ** 2, heads)) * 0.02).astype(np.float32),
                "qkv": _lin(rng, 3 * dim, dim),
                "proj": _lin(rng, dim, dim),
            },
            "conv_block": {"cab": {
                "0": _cwb(rng, dim // 4, dim, 3),
                "2": _cwb(rng, dim, dim // 4, 3),
                "3": {"attention": {"1": _cwb(rng, dim // 4, dim, 1),
                                    "3": _cwb(rng, dim, dim // 4, 1)}},
            }},
            "mlp": {"fc1": _lin(rng, 2 * dim, dim), "fc2": _lin(rng, dim, 2 * dim)},
        }

    params = {
        "conv_first": _cwb(rng, dim, 3, 3),
        "conv_after_body": _cwb(rng, dim, dim, 3),
        "conv_before_upsample": {"0": _cwb(rng, dim, dim, 3)},
        "upsample": {"0": _cwb(rng, dim * 4, dim, 3)},
        "conv_last": _cwb(rng, 3, dim, 3),
        "norm": _ln(dim),
        "layers": {"0": {
            "residual_group": {
                "blocks": {str(j): hab() for j in range(depth)},
                "overlap_attn": {
                    "norm1": _ln(dim), "norm2": _ln(dim),
                    "qkv": _lin(rng, 3 * dim, dim),
                    "proj": _lin(rng, dim, dim),
                    "relative_position_bias_table":
                        (rng.standard_normal(((ws + owin - 1) ** 2, heads)) * 0.02).astype(np.float32),
                    "mlp": {"fc1": _lin(rng, 2 * dim, dim), "fc2": _lin(rng, dim, 2 * dim)},
                },
            },
            "conv": _cwb(rng, dim, dim, 3),
        }},
    }
    return params


def test_hat_forward_and_meta():
    from forge_tpu.models.hat import hat_apply, infer_hat_meta

    params = make_tiny_hat()
    meta = infer_hat_meta(params)
    assert meta["window_size"] == 4 and meta["heads"] == 2
    assert meta["scale"] == 2 and abs(meta["overlap_ratio"] - 0.5) < 1e-6
    img = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 10, 14, 3)), jnp.float32)
    out = hat_apply(params, img, **meta)
    assert out.shape == (1, 20, 28, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_hat_unfold_matches_torch():
    torch = pytest.importorskip("torch")
    from forge_tpu.models.hat import _unfold_windows

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 12, 5)).astype(np.float32)
    ws, owin = 4, 6
    ref = torch.nn.functional.unfold(
        torch.tensor(x).permute(0, 3, 1, 2), kernel_size=owin, stride=ws,
        padding=(owin - ws) // 2)  # [B, C*owin², nW]
    nw = ref.shape[-1]
    # HAT rearranges 'b (c j) w -> (b w) j c' with j = owin²
    ref = ref.reshape(2, 5, owin * owin, nw).permute(0, 3, 2, 1).reshape(-1, owin * owin, 5).numpy()
    out = np.asarray(_unfold_windows(jnp.asarray(x), owin, ws))
    assert out.shape == ref.shape
    assert np.allclose(out, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# DAT


def make_tiny_dat(seed=0, dim=16, heads=2, scale=2):
    rng = np.random.default_rng(seed)
    pos_dim = 4

    def pos():
        return {
            "pos_proj": _lin(rng, pos_dim, 2),
            "pos1": {"0": _ln(pos_dim), "2": _lin(rng, pos_dim, pos_dim)},
            "pos2": {"0": _ln(pos_dim), "2": _lin(rng, pos_dim, pos_dim)},
            "pos3": {"0": _ln(pos_dim), "2": _lin(rng, heads // 2, pos_dim)},
        }

    def interactions():
        return {
            "dwconv": {"0": {"weight": _conv(rng, dim, 1, 3),
                             "bias": np.zeros(dim, np.float32)},
                       "1": _bn(dim)},
            "channel_interaction": {"1": _cwb(rng, dim // 8 or 1, dim, 1),
                                    "2": _bn(dim // 8 or 1),
                                    "4": _cwb(rng, dim, dim // 8 or 1, 1)},
            "spatial_interaction": {"0": _cwb(rng, dim // 16 or 1, dim, 1),
                                    "1": _bn(dim // 16 or 1),
                                    "3": _cwb(rng, 1, dim // 16 or 1, 1)},
        }

    def spatial_block():
        return {
            "norm1": _ln(dim), "norm2": _ln(dim),
            "attn": {"qkv": {"weight": (rng.standard_normal((3 * dim, dim)) * 0.08).astype(np.float32)},
                     "proj": _lin(rng, dim, dim),
                     "attns": {"0": {"pos": pos()}, "1": {"pos": pos()}},
                     **interactions()},
            "ffn": {"fc1": _lin(rng, 2 * dim, dim),
                    "sg": {"norm": _ln(dim), "conv": {"weight": _conv(rng, dim, 1, 3),
                                                      "bias": np.zeros(dim, np.float32)}},
                    "fc2": _lin(rng, dim, dim)},
        }

    def channel_block():
        blk = spatial_block()
        blk["attn"] = {"qkv": blk["attn"]["qkv"], "proj": blk["attn"]["proj"],
                       "temperature": np.ones((heads, 1, 1), np.float32),
                       **interactions()}
        return blk

    params = {
        "conv_first": _cwb(rng, dim, 3, 3),
        "before_RG": {"1": _ln(dim)},
        "conv_after_body": _cwb(rng, dim, dim, 3),
        "norm": _ln(dim),
        "upsample": {"0": _cwb(rng, 3 * scale * scale, dim, 3)},  # pixelshuffledirect
        "layers": {"0": {"blocks": {"0": spatial_block(), "1": channel_block()},
                         "conv": _cwb(rng, dim, dim, 3)}},
    }
    return params


def test_dat_forward_and_meta():
    from forge_tpu.models.dat import dat_apply, infer_dat_meta

    params = make_tiny_dat()
    meta = infer_dat_meta(params)
    assert meta == {"heads": 2, "scale": 2}
    img = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (1, 10, 14, 3)), jnp.float32)
    out = dat_apply(params, img, heads=2, split=(2, 4), scale=2)
    assert out.shape == (1, 20, 28, 3)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# registry sniffing for all three


def _save_flat(params, path):
    import safetensors.numpy

    flat = {}

    def walk(prefix, node):
        for k, v in node.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(key, v)
            else:
                arr = np.asarray(v)
                if arr.ndim == 4:  # back to torch layout on disk
                    arr = arr.transpose(3, 2, 0, 1)
                flat[key] = arr

    walk("", params)
    safetensors.numpy.save_file(flat, str(path))


@pytest.mark.parametrize("maker,fname,in_hw,out_hw", [
    (make_tiny_scunet, "scunet_tiny.safetensors", (16, 16), (16, 16)),
    (make_tiny_hat, "hat_tiny_x2.safetensors", (12, 12), (24, 24)),
    (make_tiny_dat, "dat_tiny_x2.safetensors", (12, 12), (24, 24)),
])
def test_registry_sniffs_new_archs(tmp_path, maker, fname, in_hw, out_hw):
    from forge_tpu.pipeline.upscalers import UpscalerRegistry

    _save_flat(maker(), tmp_path / fname)
    reg = UpscalerRegistry(model_dirs={"extra": str(tmp_path)})
    name = fname.rsplit(".", 1)[0]
    assert name in reg.upscalers
    img = (np.random.default_rng(5).uniform(0, 1, (*in_hw, 3)) * 255).astype(np.uint8)
    out = reg.get(name).upscale(img, out_hw[0] / in_hw[0])
    assert out.shape == (*out_hw, 3)
    assert np.isfinite(out.astype(np.float32)).all()
