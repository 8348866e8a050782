"""ZoeDepth + Marigold depth preprocessors.

Zoe: golden parity of the metric-bins head against the reference's own torch
layer modules (annotator/zoe/zoedepth/models/layers/*, which import only
torch), and of the full DPT-BEiT core against a functional torch oracle that
reproduces the reference backbone math (midas/backbones/beit.py + utils.py +
blocks.py) on the same random flat weights — including the relative-position
bias table resize for a non-trained window size.

Marigold: the lax.scan DDIM pipeline on a tiny synthetic 8-channel-UNet
checkpoint — determinism, output contract, prediction-type sensitivity.
"""

import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.state_dict import transform_for_jax
from forge_tpu.core.tree import nest

REF = "/root/reference/extensions-builtin/forge_legacy_preprocessors"
torch = pytest.importorskip("torch")
F = torch.nn.functional


def _load_ref_module(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _to_jax(flat):
    return nest({k: jnp.asarray(v) for k, v in transform_for_jax(flat).items()})


# --------------------------------------------------------------- zoe params

def _zoe_tiny_sd(seed=7):
    """Flat numpy dict in the ZoeD_M12_N key space, tiny dims: BEiT with 4
    blocks / dim 16 / 2 heads / trained window 4x4, DPT features [8,12,16,16],
    scratch 16, head 16→8→5→1, bins 6, emb 12, attractors [4,3,2,1]."""
    r = np.random.default_rng(seed)
    sd = {}

    def w(key, *shape, scale=0.2):
        sd[key] = (r.standard_normal(shape) * scale).astype(np.float32)

    def b(key, n):
        sd[key] = (r.standard_normal(n) * 0.1).astype(np.float32)

    C, HEADS, BLOCKS = 16, 2, 4
    P = "core.core.pretrained.model."
    w(P + "cls_token", 1, 1, C)
    w(P + "patch_embed.proj.weight", C, 3, 16, 16)
    b(P + "patch_embed.proj.bias", C)
    n_rel = (2 * 4 - 1) ** 2 + 3  # trained window 4x4
    for i in range(BLOCKS):
        pb = P + f"blocks.{i}."
        w(pb + "gamma_1", C, scale=0.5)
        w(pb + "gamma_2", C, scale=0.5)
        sd[pb + "norm1.weight"] = np.ones(C, np.float32)
        b(pb + "norm1.bias", C)
        sd[pb + "norm2.weight"] = np.ones(C, np.float32)
        b(pb + "norm2.bias", C)
        w(pb + "attn.qkv.weight", 3 * C, C)
        b(pb + "attn.q_bias", C)
        b(pb + "attn.v_bias", C)
        w(pb + "attn.relative_position_bias_table", n_rel, HEADS)
        w(pb + "attn.proj.weight", C, C)
        b(pb + "attn.proj.bias", C)
        w(pb + "mlp.fc1.weight", 2 * C, C)
        b(pb + "mlp.fc1.bias", 2 * C)
        w(pb + "mlp.fc2.weight", C, 2 * C)
        b(pb + "mlp.fc2.bias", C)

    feats = [8, 12, 16, 16]
    PP = "core.core.pretrained."
    for i, f_ in enumerate(feats, 1):
        ap = PP + f"act_postprocess{i}."
        w(ap + "0.project.0.weight", C, 2 * C)
        b(ap + "0.project.0.bias", C)
        w(ap + "3.weight", f_, C, 1, 1)
        b(ap + "3.bias", f_)
    w(PP + "act_postprocess1.4.weight", feats[0], feats[0], 4, 4)
    b(PP + "act_postprocess1.4.bias", feats[0])
    w(PP + "act_postprocess2.4.weight", feats[1], feats[1], 2, 2)
    b(PP + "act_postprocess2.4.bias", feats[1])
    w(PP + "act_postprocess4.4.weight", feats[3], feats[3], 3, 3)
    b(PP + "act_postprocess4.4.bias", feats[3])

    SC, S = "core.core.scratch.", 16
    for i, f_ in enumerate(feats, 1):
        w(SC + f"layer{i}_rn.weight", S, f_, 3, 3)
    for i in range(1, 5):
        rf = SC + f"refinenet{i}."
        for unit in ("resConfUnit1", "resConfUnit2"):
            for cv in ("conv1", "conv2"):
                w(rf + f"{unit}.{cv}.weight", S, S, 3, 3)
                b(rf + f"{unit}.{cv}.bias", S)
        w(rf + "out_conv.weight", S, S, 1, 1)
        b(rf + "out_conv.bias", S)
    w(SC + "output_conv.0.weight", 8, S, 3, 3)
    b(SC + "output_conv.0.bias", 8)
    w(SC + "output_conv.2.weight", 5, 8, 3, 3)
    b(SC + "output_conv.2.bias", 5)
    w(SC + "output_conv.4.weight", 1, 5, 1, 1)
    b(SC + "output_conv.4.bias", 1)

    NB, EMB, MLP = 6, 12, 10
    w("conv2.weight", S, S, 1, 1)
    b("conv2.bias", S)
    for key, ci, co in (("seed_bin_regressor._net", S, NB),
                        ("seed_projector._net", S, EMB)):
        w(key + ".0.weight", MLP, ci, 1, 1)
        b(key + ".0.bias", MLP)
        w(key + ".2.weight", co, MLP, 1, 1)
        b(key + ".2.bias", co)
    for i, na in enumerate([4, 3, 2, 1]):
        for key, co in ((f"projectors.{i}._net", EMB),
                        (f"attractors.{i}._net", na)):
            ci = S if key.startswith("proj") else EMB
            w(key + ".0.weight", MLP, ci, 1, 1)
            b(key + ".0.bias", MLP)
            w(key + ".2.weight", co, MLP, 1, 1)
            b(key + ".2.bias", co)
    BOT = (5 + 1 + EMB) // 2
    w("conditional_log_binomial.mlp.0.weight", BOT, 5 + 1 + EMB, 1, 1)
    b("conditional_log_binomial.mlp.0.bias", BOT)
    w("conditional_log_binomial.mlp.2.weight", 4, BOT, 1, 1)
    b("conditional_log_binomial.mlp.2.bias", 4)
    return sd


# ----------------------------------------------------------- torch oracle

def _t(sd, k):
    return torch.from_numpy(sd[k])


def _torch_rel_bias(sd, pb, window):
    """midas beit.py:_get_rel_pos_bias + timm gen_relative_position_index."""
    table = _t(sd, pb + "attn.relative_position_bias_table")
    rows, heads = table.shape
    side = int((np.sqrt(rows - 3) + 1) / 2)
    wh, ww = window
    new_h, new_w = 2 * wh - 1, 2 * ww - 1
    sub = table[: rows - 3]
    if (new_h, new_w) != (2 * side - 1, 2 * side - 1):
        grid = sub.reshape(1, 2 * side - 1, 2 * side - 1, -1).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, size=(new_h, new_w), mode="bilinear")
        sub = grid.permute(0, 2, 3, 1).reshape(new_h * new_w, -1)
    full = torch.cat([sub, table[rows - 3:]])
    # gen_relative_position_index (timm/reference-swin coords math)
    coords = torch.stack(torch.meshgrid(
        torch.arange(wh), torch.arange(ww), indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    num_rel = new_h * new_w
    idx = torch.zeros((n + 1, n + 1), dtype=torch.long)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel
    idx[0:, 0] = num_rel + 1
    idx[0, 0] = num_rel + 2
    bias = full[idx.view(-1)].view(n + 1, n + 1, heads)
    return bias.permute(2, 0, 1)


def _torch_beit_dpt(sd, x):
    """Functional torch DPT-BEiT (beit.py attention/block/forward_features +
    utils.py forward_adapted_unflatten + dpt_depth.py forward) → rel_depth +
    the MidasCore tap set."""
    P = "core.core.pretrained.model."
    PP = "core.core.pretrained."
    SC = "core.core.scratch."
    heads = sd[P + "blocks.0.attn.relative_position_bias_table"].shape[1]
    emb = F.conv2d(x, _t(sd, P + "patch_embed.proj.weight"),
                   _t(sd, P + "patch_embed.proj.bias"), stride=16)
    bsz, C, gh, gw = emb.shape
    tok = emb.flatten(2).transpose(1, 2)
    cls = _t(sd, P + "cls_token").expand(bsz, -1, -1)
    t = torch.cat([cls, tok], 1)
    n_blocks = len({k[len(P + "blocks."):].split(".")[0]
                    for k in sd if k.startswith(P + "blocks.")})
    hooks = [n_blocks // 4 - 1, n_blocks // 2 - 1,
             3 * n_blocks // 4 - 1, n_blocks - 1]
    acts = []
    for i in range(n_blocks):
        pb = P + f"blocks.{i}."
        h = F.layer_norm(t, (C,), _t(sd, pb + "norm1.weight"),
                         _t(sd, pb + "norm1.bias"), eps=1e-6)
        qkv_bias = torch.cat([_t(sd, pb + "attn.q_bias"),
                              torch.zeros(C), _t(sd, pb + "attn.v_bias")])
        qkv = F.linear(h, _t(sd, pb + "attn.qkv.weight"), qkv_bias)
        qkv = qkv.reshape(bsz, -1, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        att = (q * (C // heads) ** -0.5) @ k.transpose(-2, -1)
        att = att + _torch_rel_bias(sd, pb, (gh, gw)).unsqueeze(0)
        att = att.softmax(-1)
        h = (att @ v).transpose(1, 2).reshape(bsz, -1, C)
        h = F.linear(h, _t(sd, pb + "attn.proj.weight"),
                     _t(sd, pb + "attn.proj.bias"))
        t = t + _t(sd, pb + "gamma_1") * h
        h = F.layer_norm(t, (C,), _t(sd, pb + "norm2.weight"),
                         _t(sd, pb + "norm2.bias"), eps=1e-6)
        h = F.linear(F.gelu(F.linear(h, _t(sd, pb + "mlp.fc1.weight"),
                                     _t(sd, pb + "mlp.fc1.bias"))),
                     _t(sd, pb + "mlp.fc2.weight"), _t(sd, pb + "mlp.fc2.bias"))
        t = t + _t(sd, pb + "gamma_2") * h
        if i in hooks:
            acts.append(t)

    def post(i, t):
        ap = PP + f"act_postprocess{i}."
        cls, patches = t[:, :1], t[:, 1:]
        h = torch.cat([patches, cls.expand_as(patches)], -1)
        h = F.gelu(F.linear(h, _t(sd, ap + "0.project.0.weight"),
                            _t(sd, ap + "0.project.0.bias")))
        h = h.transpose(1, 2).reshape(bsz, C, gh, gw)
        h = F.conv2d(h, _t(sd, ap + "3.weight"), _t(sd, ap + "3.bias"))
        if i == 1:
            h = F.conv_transpose2d(h, _t(sd, ap + "4.weight"),
                                   _t(sd, ap + "4.bias"), stride=4)
        elif i == 2:
            h = F.conv_transpose2d(h, _t(sd, ap + "4.weight"),
                                   _t(sd, ap + "4.bias"), stride=2)
        elif i == 4:
            h = F.conv2d(h, _t(sd, ap + "4.weight"), _t(sd, ap + "4.bias"),
                         stride=2, padding=1)
        return h

    ls = [post(i + 1, acts[i]) for i in range(4)]
    rn = [F.conv2d(l, _t(sd, SC + f"layer{i}_rn.weight"), padding=1)
          for i, l in enumerate(ls, 1)]

    def rcu(pref, h):
        o = F.conv2d(F.relu(h), _t(sd, pref + "conv1.weight"),
                     _t(sd, pref + "conv1.bias"), padding=1)
        o = F.conv2d(F.relu(o), _t(sd, pref + "conv2.weight"),
                     _t(sd, pref + "conv2.bias"), padding=1)
        return h + o

    def fusion(i, h, skip, size):
        pref = SC + f"refinenet{i}."
        if skip is not None:
            h = h + rcu(pref + "resConfUnit1.", skip)
        h = rcu(pref + "resConfUnit2.", h)
        h = F.interpolate(h, size=size, mode="bilinear", align_corners=True)
        return F.conv2d(h, _t(sd, pref + "out_conv.weight"),
                        _t(sd, pref + "out_conv.bias"))

    r4 = fusion(4, rn[3], None, rn[2].shape[2:])
    r3 = fusion(3, r4, rn[2], rn[1].shape[2:])
    r2 = fusion(2, r3, rn[1], rn[0].shape[2:])
    r1 = fusion(1, r2, rn[0],
                (rn[0].shape[2] * 2, rn[0].shape[3] * 2))
    h = F.conv2d(r1, _t(sd, SC + "output_conv.0.weight"),
                 _t(sd, SC + "output_conv.0.bias"), padding=1)
    h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
    out_act = F.relu(F.conv2d(h, _t(sd, SC + "output_conv.2.weight"),
                              _t(sd, SC + "output_conv.2.bias"), padding=1))
    rel = F.relu(F.conv2d(out_act, _t(sd, SC + "output_conv.4.weight"),
                          _t(sd, SC + "output_conv.4.bias")))[:, 0]
    return rel, {"out_conv": out_act, "l4_rn": rn[3],
                 "r4": r4, "r3": r3, "r2": r2, "r1": r1}


# -------------------------------------------------------------------- tests

@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_zoe_head_parity_vs_reference_layers():
    """Metric-bins head vs the reference's own layer modules (zoedepth_v1.py
    forward wiring, attractor/localbins/dist_layers math) on random weights."""
    from forge_tpu.preprocessors.zoe import zoe_head

    base = "annotator/zoe/zoedepth/models/layers"
    attractor = _load_ref_module(f"{base}/attractor.py", "ref_zoe_attractor")
    localbins = _load_ref_module(f"{base}/localbins_layers.py",
                                 "ref_zoe_localbins")
    dist = _load_ref_module(f"{base}/dist_layers.py", "ref_zoe_dist")

    sd = _zoe_tiny_sd()
    S, NB, EMB, MLP = 16, 6, 12, 10
    torch.manual_seed(0)
    conv2 = torch.nn.Conv2d(S, S, 1)
    seed_rg = localbins.SeedBinRegressorUnnormed(S, n_bins=NB, mlp_dim=MLP)
    seed_pj = localbins.Projector(S, EMB, mlp_dim=MLP)
    pjs = [localbins.Projector(S, EMB, mlp_dim=MLP) for _ in range(4)]
    ats = [attractor.AttractorLayerUnnormed(
        EMB, NB, n_attractors=na, mlp_dim=MLP, alpha=1000, gamma=2,
        kind="mean", attractor_type="inv", memory_efficient=True)
        for na in (4, 3, 2, 1)]
    clb = dist.ConditionalLogBinomial(5 + 1, EMB, n_classes=NB,
                                      min_temp=0.0212, max_temp=50.0)
    conv2.load_state_dict({"weight": _t(sd, "conv2.weight"),
                           "bias": _t(sd, "conv2.bias")})
    for mod, pref in [(seed_rg, "seed_bin_regressor."),
                      (seed_pj, "seed_projector."),
                      (pjs[0], "projectors.0."), (pjs[1], "projectors.1."),
                      (pjs[2], "projectors.2."), (pjs[3], "projectors.3."),
                      (ats[0], "attractors.0."), (ats[1], "attractors.1."),
                      (ats[2], "attractors.2."), (ats[3], "attractors.3."),
                      (clb, "conditional_log_binomial.")]:
        mod.load_state_dict({k[len(pref):]: _t(sd, k)
                             for k in sd if k.startswith(pref)},
                            strict=False)  # k_idx/K_minus_1 are buffers

    r = np.random.default_rng(1)
    taps_np = {"l4_rn": r.standard_normal((1, S, 2, 3)).astype(np.float32),
               "r4": r.standard_normal((1, S, 4, 6)).astype(np.float32),
               "r3": r.standard_normal((1, S, 8, 12)).astype(np.float32),
               "r2": r.standard_normal((1, S, 16, 24)).astype(np.float32),
               "out_conv": r.standard_normal((1, 5, 64, 96)).astype(np.float32)}
    taps_np["r1"] = r.standard_normal((1, S, 32, 48)).astype(np.float32)
    rel_np = r.standard_normal((1, 64, 96)).astype(np.float32) ** 2

    with torch.no_grad():
        x = conv2(torch.from_numpy(taps_np["l4_rn"]))
        _, seed_centers = seed_rg(x)
        b_prev, prev_emb = seed_centers, seed_pj(x)
        for pj, at, key in zip(pjs, ats, ("r4", "r3", "r2", "r1")):
            embt = pj(torch.from_numpy(taps_np[key]))
            bt, b_centers = at(embt, b_prev, prev_emb, interpolate=True)
            b_prev, prev_emb = bt, embt
        rel = torch.from_numpy(rel_np).unsqueeze(1)
        last = torch.cat(
            [torch.from_numpy(taps_np["out_conv"]),
             F.interpolate(rel, taps_np["out_conv"].shape[2:],
                           mode="bilinear", align_corners=True)], 1)
        cond = F.interpolate(embt, last.shape[2:], mode="bilinear",
                             align_corners=True)
        probs = clb(last, cond)
        b_centers = F.interpolate(b_centers, probs.shape[2:],
                                  mode="bilinear", align_corners=True)
        want = torch.sum(probs * b_centers, dim=1).numpy()

    head_sd = {k: v for k, v in sd.items()
               if not k.startswith("core.") }
    params = _to_jax(head_sd)
    taps = {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in taps_np.items()}
    got = np.asarray(zoe_head(params, jnp.asarray(rel_np), taps))
    assert want.shape == got.shape
    assert np.abs(want - got).max() < 2e-4, np.abs(want - got).max()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_zoe_backbone_parity():
    """DPT-BEiT core vs the functional torch oracle, window 4x6 ≠ trained 4x4
    (exercises the rel-pos table resize)."""
    from forge_tpu.preprocessors.zoe import _dpt_beit

    sd = _zoe_tiny_sd()
    x = np.random.default_rng(2).standard_normal((1, 3, 64, 96)).astype(
        np.float32) * 0.5
    with torch.no_grad():
        want_rel, want_taps = _torch_beit_dpt(sd, torch.from_numpy(x))
    params = _to_jax({k[len("core.core."):]: v for k, v in sd.items()
                      if k.startswith("core.core.")})
    got_rel, got_taps = _dpt_beit(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    def rel_err(w, g):
        return np.abs(w - g).max() / max(np.abs(w).max(), 1e-6)

    assert rel_err(want_rel.numpy(), np.asarray(got_rel)) < 1e-4
    for k in ("out_conv", "l4_rn", "r4", "r3", "r2", "r1"):
        w = want_taps[k].numpy().transpose(0, 2, 3, 1)
        g = np.asarray(got_taps[k])
        assert w.shape == g.shape, k
        assert rel_err(w, g) < 1e-4, (k, rel_err(w, g))


def test_zoe_detector_end_to_end(tmp_path):
    """Detector contract on a synthetic checkpoint: pad/flip augmentation,
    percentile normalization, uint8 HWC3 output."""
    from forge_tpu.core.save import save_safetensors
    from forge_tpu.preprocessors.zoe import ZoeDetector

    d = tmp_path / "zoe"
    d.mkdir()
    save_safetensors(_zoe_tiny_sd(), str(d / "ZoeD_tiny.safetensors"))
    det = ZoeDetector(model_dir=str(d), net_h=64, net_w=96)
    img = np.zeros((70, 90, 3), np.uint8)
    img[20:50, 30:60] = 200
    out = det.detect(img)
    assert out.shape == (70, 90, 3) and out.dtype == np.uint8
    assert out.max() > out.min()
    assert np.array_equal(out, det.detect(img))


def _tiny_marigold_ckpt(tmp_path, seed=31):
    from forge_tpu.core.save import save_safetensors
    from forge_tpu.core.synth import synth_clip_sd, synth_unet_sd, synth_vae_sd

    sd = {}
    sd.update(synth_unet_sd(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        transformer_depth=(0, 1), middle_depth=1, context_dim=48,
        in_channels=8, fill="random", seed=seed, prefix="unet."))
    sd.update(synth_vae_sd(ch=32, fill="random", seed=seed + 1, prefix="vae."))
    sd.update(synth_clip_sd(width=48, layers=2, fill="random", seed=seed + 2,
                            prefix="text_encoder."))
    path = str(tmp_path / "marigold.safetensors")
    save_safetensors(sd, path)
    return path


def test_marigold_pipeline(tmp_path):
    """DDIM scan over the 8-channel UNet: deterministic uint8 depth map;
    step count changes the trajectory."""
    from forge_tpu.preprocessors.marigold import MarigoldPipeline

    pipe = MarigoldPipeline.from_file(_tiny_marigold_ckpt(tmp_path))
    assert pipe.empty_embed.shape[1] == 2  # [BOS, EOS] do_not_pad tokens
    img = np.full((64, 64, 3), 90, np.uint8)
    img[16:48, 16:48] = 220
    out = pipe.run(img, steps=3, seed=5)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    assert np.array_equal(out, pipe.run(img, steps=3, seed=5))
    assert not np.array_equal(out, pipe.run(img, steps=2, seed=5))


def test_marigold_detector_resizes(tmp_path):
    from forge_tpu.preprocessors.marigold import MarigoldDetector

    _tiny_marigold_ckpt(tmp_path)
    det = MarigoldDetector(model_dir=str(tmp_path))
    out = det.detect(np.full((70, 80, 3), 128, np.uint8), steps=2)
    assert out.shape == (70, 80, 3) and out.dtype == np.uint8


def test_registry_has_zoe_and_marigold():
    from forge_tpu.preprocessors import get_preprocessor

    for name in ("depth_zoe", "depth_marigold"):
        p = get_preprocessor(name)
        assert p is not None and p.needs_weights
