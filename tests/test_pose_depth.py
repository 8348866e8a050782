"""OpenPose body CPM + DPT MiDaS preprocessors on tiny synthetic
checkpoints in the released key layouts."""

import numpy as np

import jax.numpy as jnp


def _cv(rng, o, i, k):
    return {"weight": jnp.asarray(rng.standard_normal((k, k, i, o)).astype(np.float32)
                                  * (0.4 / np.sqrt(k * k * i))),
            "bias": jnp.zeros(o, jnp.float32)}


def _lin(rng, o, i):
    return {"weight": (rng.standard_normal((o, i)) * (0.3 / np.sqrt(i))).astype(np.float32),
            "bias": np.zeros(o, np.float32)}


def _ln(c):
    return {"weight": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}


# ---------------------------------------------------------------------------
# openpose


def make_tiny_body(seed=0):
    rng = np.random.default_rng(seed)
    p = {"model0": {}}
    trunk = [("conv1_1", 3, 64), ("conv1_2", 64, 64), ("conv2_1", 64, 128),
             ("conv2_2", 128, 128), ("conv3_1", 128, 256), ("conv3_2", 256, 256),
             ("conv3_3", 256, 256), ("conv3_4", 256, 256), ("conv4_1", 256, 512),
             ("conv4_2", 512, 512), ("conv4_3_CPM", 512, 256), ("conv4_4_CPM", 256, 128)]
    # shrink every channel count 8x for the test
    for name, i, o in trunk:
        p["model0"][name] = _cv(rng, max(o // 8, 8), 3 if i == 3 else max(i // 8, 8), 3)
    for br, out in (("1", 38), ("2", 19)):
        blk = {}
        for j in range(1, 4):
            blk[f"conv5_{j}_CPM_L{br}"] = _cv(rng, 16, 16, 3)
        blk[f"conv5_4_CPM_L{br}"] = _cv(rng, 64, 16, 1)
        blk[f"conv5_5_CPM_L{br}"] = _cv(rng, out, 64, 1)
        p[f"model1_{br}"] = blk
    for s in range(2, 7):
        for br, out in (("1", 38), ("2", 19)):
            blk = {}
            blk[f"Mconv1_stage{s}_L{br}"] = _cv(rng, 16, 38 + 19 + 16, 7)
            for j in range(2, 6):
                blk[f"Mconv{j}_stage{s}_L{br}"] = _cv(rng, 16, 16, 7)
            blk[f"Mconv6_stage{s}_L{br}"] = _cv(rng, 16, 16, 1)
            blk[f"Mconv7_stage{s}_L{br}"] = _cv(rng, out, 16, 1)
            p[f"model{s}_{br}"] = blk
    return p


def test_body_apply_shapes():
    from forge_tpu.preprocessors.openpose import body_apply

    p = make_tiny_body()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 48, 3)),
                    jnp.float32)
    paf, heat = body_apply(p, x)
    assert paf.shape == (1, 8, 6, 38)
    assert heat.shape == (1, 8, 6, 19)


def test_paf_postprocessing_assembles_a_person():
    """Synthetic heatmap/PAF with one clean two-keypoint limb chain must
    assemble into one subset row and draw a non-empty canvas."""
    from forge_tpu.preprocessors.openpose import (
        LIMB_SEQ,
        MAP_IDX,
        assemble_people,
        draw_bodypose,
        find_peaks,
        match_limbs,
    )

    h = w = 64
    heat = np.zeros((h, w, 19), np.float32)
    paf = np.zeros((h, w, 38), np.float32)
    # place parts 1..8 (limb chain via LIMB_SEQ entries using part 2) along a line
    pts = {1: (32, 10), 2: (32, 20), 3: (22, 20), 6: (42, 20), 9: (27, 40), 12: (37, 40)}
    for part, (x, y) in pts.items():
        heat[y - 2:y + 3, x - 2:x + 3, part - 1] = 1.0  # blob survives smoothing
    for k, (a, b) in enumerate(LIMB_SEQ):
        if a in pts and b in pts:
            (ax, ay), (bx, by) = pts[a], pts[b]
            vec = np.array([bx - ax, by - ay], np.float32)
            vec = vec / max(np.linalg.norm(vec), 1e-3)
            for t in np.linspace(0, 1, 20):
                x = int(round(ax + t * (bx - ax)))
                y = int(round(ay + t * (by - ay)))
                paf[y, x, MAP_IDX[k][0] - 19] = vec[0]
                paf[y, x, MAP_IDX[k][1] - 19] = vec[1]
    peaks = find_peaks(heat, thre1=0.05)
    assert sum(len(pk) for pk in peaks) == len(pts)
    conns = match_limbs(paf, peaks, h, thre2=0.01)
    candidate, subset = assemble_people(peaks, conns)
    assert len(subset) == 1          # one person
    assert subset[0][-1] >= 4        # with at least 4 parts
    canvas = draw_bodypose((h, w), candidate, subset)
    assert canvas.shape == (h, w, 3) and canvas.max() > 0


# ---------------------------------------------------------------------------
# DPT depth


def make_tiny_dpt(seed=0, dim=16, heads=2, depth=2, feat=8):
    rng = np.random.default_rng(seed)
    vit = {
        "cls_token": (rng.standard_normal((1, 1, dim)) * 0.02).astype(np.float32),
        "pos_embed": (rng.standard_normal((1, 4 * 4 + 1, dim)) * 0.02).astype(np.float32),
        "patch_embed": {"proj": _cv(rng, dim, 3, 16)},
        "blocks": {},
    }
    for i in range(depth):
        vit["blocks"][str(i)] = {
            "norm1": _ln(dim), "norm2": _ln(dim),
            "attn": {"qkv": _lin(rng, 3 * dim, dim), "proj": _lin(rng, dim, dim)},
            "mlp": {"fc1": _lin(rng, 2 * dim, dim), "fc2": _lin(rng, dim, 2 * dim)},
        }
    widths = {1: 4, 2: 8, 3: 12, 4: 16}

    def tconv(o, i, k):  # torch transpose layout [I,O,k,k] → loader [k,k,O,I]
        w = (rng.standard_normal((i, o, k, k)) * 0.2).astype(np.float32)
        return {"weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.zeros(o, jnp.float32)}

    pretrained = {"model": vit}
    for n in (1, 2, 3, 4):
        pp = {"0": {"project": {"0": _lin(rng, dim, 2 * dim)}},
              "3": _cv(rng, widths[n], dim, 1)}
        if n == 1:
            pp["4"] = tconv(widths[n], widths[n], 4)
        elif n == 2:
            pp["4"] = tconv(widths[n], widths[n], 2)
        elif n == 4:
            pp["4"] = _cv(rng, widths[n], widths[n], 3)
        pretrained[f"act_postprocess{n}"] = pp

    def rcu():
        return {"conv1": _cv(rng, feat, feat, 3), "conv2": _cv(rng, feat, feat, 3)}

    scratch = {"output_conv": {"0": _cv(rng, feat // 2, feat, 3),
                               "2": _cv(rng, 4, feat // 2, 3),
                               "4": _cv(rng, 1, 4, 1)}}
    for n in (1, 2, 3, 4):
        scratch[f"layer{n}_rn"] = _cv(rng, feat, widths[n], 3)
        scratch[f"refinenet{n}"] = {"resConfUnit1": rcu(), "resConfUnit2": rcu(),
                                    "out_conv": _cv(rng, feat, feat, 1)}
    return {"pretrained": pretrained, "scratch": scratch}


def test_dpt_apply_shapes():
    from forge_tpu.preprocessors.depth import dpt_apply

    p = make_tiny_dpt()
    img = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64, 64, 3)),
                      jnp.float32)
    out = dpt_apply(p, img, heads=2)
    assert out.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# HED soft edge


def test_hed_apply_matches_reference_structure():
    """Five side maps at strides 1/2/4/8/16; sigmoid-averaged edge in [0,1]."""
    from forge_tpu.preprocessors.hed import hed_apply

    rng = np.random.default_rng(3)

    def conv(o, i):
        return {"weight": jnp.asarray((rng.standard_normal((3, 3, i, o)) * 0.1
                                       / np.sqrt(9 * i)).astype(np.float32)),
                "bias": jnp.zeros(o, jnp.float32)}

    def proj(i):
        return {"weight": jnp.asarray((rng.standard_normal((1, 1, i, 1)) * 0.1).astype(np.float32)),
                "bias": jnp.zeros(1, jnp.float32)}

    chans = {1: (3, 8), 2: (8, 8), 3: (8, 8), 4: (8, 8), 5: (8, 8)}
    layers = {1: 2, 2: 2, 3: 3, 4: 3, 5: 3}
    p = {"norm": jnp.zeros((1, 3, 1, 1), jnp.float32)}
    for b, (ci, co) in chans.items():
        blk = {"convs": {}, "projection": proj(co)}
        for j in range(layers[b]):
            blk["convs"][str(j)] = conv(co, ci if j == 0 else co)
        p[f"block{b}"] = blk

    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    outs = hed_apply(p, x)
    assert [o.shape for o in outs] == [(1, 64, 64, 1), (1, 32, 32, 1),
                                       (1, 16, 16, 1), (1, 8, 8, 1), (1, 4, 4, 1)]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
