"""GFPGAN v1 Clean port on a tiny synthetic checkpoint in the released key
layout (UNet + StyleGAN2-CSFT decoder)."""

import numpy as np

import jax.numpy as jnp

from forge_tpu.postprocessing.gfpgan import GFPGAN, gfpgan_apply


def _c(rng, o, i, k, bias=True):
    d = {"weight": jnp.asarray((rng.standard_normal((k, k, i, o)) * 0.2
                                / np.sqrt(k * k * i)).astype(np.float32))}
    if bias:
        d["bias"] = jnp.zeros(o, jnp.float32)
    return d


def _lin(rng, o, i):
    return {"weight": jnp.asarray((rng.standard_normal((o, i)) * 0.2
                                   / np.sqrt(i)).astype(np.float32)),
            "bias": jnp.zeros(o, jnp.float32)}


def make_tiny_gfpgan(seed=0, uc=8, dc=16, nsf=16, out_size=32):
    rng = np.random.default_rng(seed)
    n_levels = 3  # log2(32) - 2
    num_latent = 2 * 5 - 2

    def resblock():
        return {"conv1": _c(rng, uc, uc, 3), "conv2": _c(rng, uc, uc, 3),
                "skip": _c(rng, uc, uc, 1, bias=False)}

    def mod_conv(o, i, k):
        return {"weight": jnp.asarray((rng.standard_normal((1, o, i, k, k))
                                       * (1 / np.sqrt(i * k * k))).astype(np.float32)),
                "modulation": _lin(rng, i, nsf)}

    def style_conv(o, i):
        return {"modulated_conv": mod_conv(o, i, 3),
                "weight": jnp.zeros((1,), jnp.float32),
                "bias": jnp.zeros((1, o, 1, 1), jnp.float32)}

    def to_rgb(i):
        return {"modulated_conv": mod_conv(3, i, 1),
                "bias": jnp.zeros((1, 3, 1, 1), jnp.float32)}

    noises = {"noise0": jnp.asarray(rng.standard_normal((1, 1, 4, 4)), jnp.float32)}
    idx = 1
    for lvl in range(n_levels):
        size = 8 * (2 ** lvl)
        for _ in range(2):
            noises[f"noise{idx}"] = jnp.asarray(
                rng.standard_normal((1, 1, size, size)), jnp.float32)
            idx += 1

    dec = {
        "constant_input": {"weight": jnp.asarray(
            rng.standard_normal((1, dc, 4, 4)).astype(np.float32))},
        "style_conv1": style_conv(dc, dc),
        "to_rgb1": to_rgb(dc),
        "style_convs": {str(i): style_conv(dc, dc) for i in range(2 * n_levels)},
        "to_rgbs": {str(i): to_rgb(dc) for i in range(n_levels)},
        "noises": noises,
    }
    params = {
        "conv_body_first": _c(rng, uc, 3, 1),
        "conv_body_down": {str(i): resblock() for i in range(n_levels)},
        "final_conv": _c(rng, uc, uc, 3),
        "final_linear": _lin(rng, num_latent * nsf, uc * 16),
        "conv_body_up": {str(i): resblock() for i in range(n_levels)},
        "condition_scale": {str(i): {"0": _c(rng, uc, uc, 3), "2": _c(rng, dc // 2, uc, 3)}
                            for i in range(n_levels)},
        "condition_shift": {str(i): {"0": _c(rng, uc, uc, 3), "2": _c(rng, dc // 2, uc, 3)}
                            for i in range(n_levels)},
        "toRGB": {str(i): _c(rng, 3, uc, 1) for i in range(n_levels)},
        "stylegan_decoder": dec,
    }
    return params


def test_gfpgan_forward_deterministic():
    p = make_tiny_gfpgan()
    img = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)),
                      jnp.float32)
    out1 = np.asarray(gfpgan_apply(p, img))
    out2 = np.asarray(gfpgan_apply(p, img))
    assert out1.shape == (2, 32, 32, 3)
    assert np.isfinite(out1).all() and (np.abs(out1) <= 1.0).all()
    assert np.array_equal(out1, out2)  # stored noises → deterministic


def test_restorer_option_dispatch(tmp_path):
    from forge_tpu.postprocessing.faces import get_face_restorer
    from forge_tpu.runtime.options import opts

    with opts.override({"face_restoration_model": "GFPGAN"}):
        r = get_face_restorer()
        assert isinstance(r, GFPGAN)
    with opts.override({"face_restoration_model": "CodeFormer"}):
        r = get_face_restorer()
        assert not isinstance(r, GFPGAN)
