"""Face restoration (CodeFormer JAX) + CLIP interrogator tests on synthetic
weights shaped like the official checkpoints — key compatibility and e2e
wiring are the assertions (VERDICT r1 next-step #9)."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.tree import nest


# -- synthetic CodeFormer ------------------------------------------------------
# Official layout but tiny: nf=8, ch_mult=[1,2], resolution 16 → latent 8²,
# codebook 32×16, 2 transformer layers, embed 16. The architecture walker
# discovers structure from keys, so a scaled-down tree exercises every path.


def _conv(rng, o, i, k=3):
    return (rng.standard_normal((k, k, i, o)) * (0.4 / np.sqrt(k * k * i))).astype(np.float32)


def _norm(c):
    return {"weight": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}


def _res(rng, cin, cout):
    p = {"norm1": _norm(cin), "conv1": {"weight": _conv(rng, cout, cin), "bias": np.zeros(cout, np.float32)},
         "norm2": _norm(cout), "conv2": {"weight": _conv(rng, cout, cout), "bias": np.zeros(cout, np.float32)}}
    if cin != cout:
        p["conv_out"] = {"weight": _conv(rng, cout, cin, 1), "bias": np.zeros(cout, np.float32)}
    return p


def _attn(rng, c):
    one = lambda o, i: {"weight": _conv(rng, o, i, 1), "bias": np.zeros(o, np.float32)}
    return {"norm": _norm(c), "q": one(c, c), "k": one(c, c), "v": one(c, c),
            "proj_out": one(c, c)}


def make_tiny_codeformer(seed=0):
    rng = np.random.default_rng(seed)
    nf, emb, cw = 8, 16, 16  # base ch, codebook dim, transformer width
    ch = [nf, nf * 2]  # 16 → 8 latent (one downsample)

    enc = {}
    i = 0
    enc[str(i)] = {"weight": _conv(rng, nf, 3), "bias": np.zeros(nf, np.float32)}; i += 1
    enc[str(i)] = _res(rng, nf, ch[0]); i += 1
    enc[str(i)] = _res(rng, ch[0], ch[0]); i += 1
    enc[str(i)] = {"conv": {"weight": _conv(rng, ch[0], ch[0]), "bias": np.zeros(ch[0], np.float32)}}; i += 1  # down
    enc[str(i)] = _res(rng, ch[0], ch[1]); i += 1
    enc[str(i)] = _res(rng, ch[1], ch[1]); i += 1
    enc[str(i)] = _res(rng, ch[1], ch[1]); i += 1  # mid
    enc[str(i)] = _attn(rng, ch[1]); i += 1
    enc[str(i)] = _res(rng, ch[1], ch[1]); i += 1
    enc[str(i)] = _norm(ch[1]); i += 1
    enc[str(i)] = {"weight": _conv(rng, emb, ch[1]), "bias": np.zeros(emb, np.float32)}

    gen = {}
    i = 0
    gen[str(i)] = {"weight": _conv(rng, ch[1], emb), "bias": np.zeros(ch[1], np.float32)}; i += 1
    gen[str(i)] = _res(rng, ch[1], ch[1]); i += 1
    gen[str(i)] = _attn(rng, ch[1]); i += 1
    gen[str(i)] = _res(rng, ch[1], ch[1]); i += 1
    gen[str(i)] = {"conv": {"weight": _conv(rng, ch[1], ch[1]), "bias": np.zeros(ch[1], np.float32)}}; i += 1  # up → 16
    gen[str(i)] = _res(rng, ch[1], ch[0]); i += 1  # fuse point @16
    gen[str(i)] = _res(rng, ch[0], ch[0]); i += 1
    gen[str(i)] = _norm(ch[0]); i += 1
    gen[str(i)] = {"weight": _conv(rng, 3, ch[0]), "bias": np.zeros(3, np.float32)}

    n_tokens = 8 * 8
    params = {
        "encoder": {"blocks": enc},
        "generator": {"blocks": gen},
        "quantize": {"embedding": {"weight": rng.standard_normal((32, emb)).astype(np.float32)}},
        "position_emb": rng.standard_normal((n_tokens, cw)).astype(np.float32) * 0.02,
        "feat_emb": {"weight": rng.standard_normal((cw, emb)).astype(np.float32) * 0.2,
                     "bias": np.zeros(cw, np.float32)},
        "ft_layers": {},
        "idx_pred_layer": {"0": _norm(cw),
                           "1": {"weight": rng.standard_normal((32, cw)).astype(np.float32) * 0.2}},
        "fuse_convs_dict": {
            "16": {"encode_enc": _res(rng, ch[0] * 2, ch[0]),
                   "scale": {"0": {"weight": _conv(rng, ch[0], ch[0]), "bias": np.zeros(ch[0], np.float32)},
                             "2": {"weight": _conv(rng, ch[0], ch[0]), "bias": np.zeros(ch[0], np.float32)}},
                   "shift": {"0": {"weight": _conv(rng, ch[0], ch[0]), "bias": np.zeros(ch[0], np.float32)},
                             "2": {"weight": _conv(rng, ch[0], ch[0]), "bias": np.zeros(ch[0], np.float32)}}},
        },
    }
    for li in range(2):
        params["ft_layers"][str(li)] = {
            "self_attn": {"in_proj_weight": rng.standard_normal((3 * cw, cw)).astype(np.float32) * 0.1,
                          "in_proj_bias": np.zeros(3 * cw, np.float32),
                          "out_proj": {"weight": rng.standard_normal((cw, cw)).astype(np.float32) * 0.1,
                                       "bias": np.zeros(cw, np.float32)}},
            "linear1": {"weight": rng.standard_normal((cw * 2, cw)).astype(np.float32) * 0.1,
                        "bias": np.zeros(cw * 2, np.float32)},
            "linear2": {"weight": rng.standard_normal((cw, cw * 2)).astype(np.float32) * 0.1,
                        "bias": np.zeros(cw, np.float32)},
            "norm1": _norm(cw), "norm2": _norm(cw),
        }
    return jnp.tree.map(jnp.asarray, params) if hasattr(jnp, "tree") else params


def test_codeformer_forward_shapes():
    from forge_tpu.models.codeformer import codeformer_apply

    params = make_tiny_codeformer()
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
    out = codeformer_apply(params, x, w=0.5)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # w gates fusion: w=0 skips the fuse blocks entirely → different output
    out0 = codeformer_apply(params, x, w=0.0)
    assert not np.allclose(np.asarray(out), np.asarray(out0))


def test_codeformer_adain_matches_stats():
    from forge_tpu.models.codeformer import _adain

    rng = np.random.default_rng(2)
    content = jnp.asarray(rng.standard_normal((1, 8, 8, 4)) * 3 + 1, jnp.float32)
    style = jnp.asarray(rng.standard_normal((1, 8, 8, 4)) * 0.5 - 2, jnp.float32)
    out = np.asarray(_adain(content, style))
    assert np.allclose(out.mean(axis=(1, 2)), np.asarray(style).mean(axis=(1, 2)), atol=1e-3)
    assert np.allclose(out.std(axis=(1, 2)), np.asarray(style).std(axis=(1, 2)), atol=1e-2)


def test_face_restore_fullframe_fallback():
    """Without detector assets the whole (square) frame is one face; the
    restore fn runs and the paste-back is feathered + finite."""
    from forge_tpu.postprocessing.faces import detect_faces, restore_faces_in_image

    img = np.full((64, 64, 3), 100, np.uint8)
    boxes = detect_faces(img)
    assert boxes == [(0, 0, 64, 64)]

    calls = []

    def fake_restore(crop):
        calls.append(crop.shape)
        return np.full_like(crop, 200)

    out = restore_faces_in_image(img, fake_restore, face_size=32)
    assert calls == [(32, 32, 3)]
    assert out.shape == img.shape
    # center fully restored, corners feathered toward original
    assert out[32, 32, 0] == 200
    assert out[0, 0, 0] < 200


def test_face_restorer_e2e_synthetic():
    from forge_tpu.postprocessing.faces import FaceRestorer

    restorer = FaceRestorer(params=make_tiny_codeformer())
    # tiny net expects 16² crops; use a 16² "image" so resize is identity-ish
    img = np.random.default_rng(3).integers(0, 255, (16, 16, 3), dtype=np.uint8)
    restorer._load()
    # monkey-wire the face size through restore_faces_in_image directly
    from forge_tpu.postprocessing import faces as faces_mod

    params, apply_fn = restorer._load()

    def restore_crop(crop):
        x = jnp.asarray(crop, jnp.float32)[None] / 127.5 - 1.0
        y = apply_fn(params, x, w=0.5)
        return np.asarray(jnp.clip((y[0] + 1.0) * 127.5, 0, 255), np.float32)

    out = faces_mod.restore_faces_in_image(img, restore_crop, face_size=16)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float32)).all()


# -- interrogator --------------------------------------------------------------


def test_interrogator_ranks_synthetic():
    """Synthetic CLIP whose towers are controlled so ranking is predictable:
    inject embeddings directly through the cache + a fake image embed."""
    from forge_tpu.postprocessing.interrogate import ClipInterrogator

    it = ClipInterrogator(params={})  # params unused when caches are primed
    it._tokenizer = object()
    e_good = np.array([1.0, 0.0, 0.0], np.float32)
    e_bad = np.array([0.0, 1.0, 0.0], np.float32)
    it._text_cache = {"oil painting": e_good, "photograph": e_bad}
    ranked = it.rank(np.array([0.9, 0.1, 0.0], np.float32),
                     ["oil painting", "photograph"], top_count=2)
    assert ranked[0][0] == "oil painting"
    assert ranked[0][1] > ranked[1][1]


def test_interrogate_categories(tmp_path):
    from forge_tpu.postprocessing.interrogate import load_categories

    (tmp_path / "mediums.txt").write_text("oil painting\nwatercolor\n")
    (tmp_path / "artists.txt").write_text("greg\n")
    cats = load_categories(str(tmp_path))
    assert cats["mediums"] == ["oil painting", "watercolor"]
    assert cats["artists"] == ["by greg"]


def test_interrogate_endpoint_contract():
    """Endpoint 404s without an image and reports cleanly without weights."""
    from forge_tpu.api.server import Api, ApiError
    from forge_tpu.runtime.models import ModelManager

    api = Api(ModelManager())
    with pytest.raises(ApiError):
        api.interrogate({}, {})
    # 1×1 white pixel png
    import base64
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), "white").save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    out = api.interrogate({}, {"image": b64})
    assert "caption" in out
    # no CLIP checkpoint installed in the test env → explanatory detail
    assert out["caption"] == "" and "CLIP" in out.get("detail", "")
