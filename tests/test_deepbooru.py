"""DeepDanbooru tagger port: plan reconstruction from ordered conv shapes
(stem / proj-first stage head / proj-last mid-stage downsample / identity /
head) and end-to-end tagging on a tiny synthetic checkpoint."""

import numpy as np

import jax.numpy as jnp

from forge_tpu.postprocessing.deepbooru import (
    DeepDanbooru,
    build_plan,
    deepbooru_apply,
)


def _cv(rng, o, i, k):
    return {"weight": jnp.asarray(rng.standard_normal((k, k, i, o)).astype(np.float32)
                                  * (0.5 / np.sqrt(k * k * i))),
            "bias": jnp.zeros(o, jnp.float32)}


def make_tiny_deepbooru(seed=0, dim=8, tags=5):
    """Index grammar mirrors resnet_custom_v3: stem, stage-1 head
    (projection first, stride 1), identity block, proj-last downsample
    (the n_Conv_97..100 pattern), stride-2 stage head, 1×1 tag head."""
    rng = np.random.default_rng(seed)
    e = 4 * dim
    p = {
        "n_Conv_0": _cv(rng, dim, 3, 7),
        "n_Conv_1": _cv(rng, e, dim, 1),      # stage1 proj (stride 1)
        "n_Conv_2": _cv(rng, dim, dim, 1),
        "n_Conv_3": _cv(rng, dim, dim, 3),
        "n_Conv_4": _cv(rng, e, dim, 1),
        "n_Conv_5": _cv(rng, dim, e, 1),      # identity
        "n_Conv_6": _cv(rng, dim, dim, 3),
        "n_Conv_7": _cv(rng, e, dim, 1),
        "n_Conv_8": _cv(rng, dim, e, 1),      # proj-last downsample
        "n_Conv_9": _cv(rng, dim, dim, 3),
        "n_Conv_10": _cv(rng, e, dim, 1),
        "n_Conv_11": _cv(rng, e, e, 1),
        "n_Conv_12": _cv(rng, 2 * e, e, 1),   # stage2 proj (stride 2)
        "n_Conv_13": _cv(rng, 2 * dim, e, 1),
        "n_Conv_14": _cv(rng, 2 * dim, 2 * dim, 3),
        "n_Conv_15": _cv(rng, 2 * e, 2 * dim, 1),
        "n_Conv_16": _cv(rng, tags, 2 * e, 1),
    }
    return p


def test_build_plan_grammar():
    p = make_tiny_deepbooru()
    plan = build_plan(p)
    assert plan[0] == ("stem", 0)
    assert plan[1] == ("block", 1, 2, 3, 4, 1)     # proj-first, stride 1
    assert plan[2] == ("block", None, 5, 6, 7, 1)  # identity
    assert plan[3] == ("block", 11, 8, 9, 10, 2)   # proj-last downsample
    assert plan[4] == ("block", 12, 13, 14, 15, 2)  # stage head, stride 2
    assert plan[5] == ("head", 16)


def test_forward_shapes_and_probs():
    p = make_tiny_deepbooru()
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)),
                    jnp.float32)
    y = np.asarray(deepbooru_apply(p, x))
    assert y.shape == (2, 5)
    assert (y > 0).all() and (y < 1).all()


def test_tag_formatting(tmp_path, monkeypatch):
    db = DeepDanbooru(model_dir=str(tmp_path))
    db.params = make_tiny_deepbooru()
    db.tags = ["long_hair", "rating:safe", "smile(happy)", "sky", "tree"]
    import jax

    db._jit = jax.jit(lambda t: deepbooru_apply(db.params, t))
    img = (np.random.default_rng(2).uniform(0, 1, (64, 64, 3)) * 255).astype(np.uint8)
    out = db.tag(img, threshold=0.0, include_ranks=False)
    assert "rating:safe" not in out      # rating tags dropped
    assert "long hair" in out            # underscores become spaces
    assert "smile\\(happy\\)" in out     # parens escaped
    probs = db.probabilities(img)
    assert probs.shape == (5,)
