"""OneFormer (seg_ofade20k / seg_ofcoco): parity of the two numerically
delicate cores against the reference's own torch code (PositionEmbeddingSine,
ms_deform_attn_core_pytorch — both torch-only importable), plus a tiny
synthetic end-to-end through the full Swin → pixel-decoder → masked-decoder →
semantic-inference graph, and the registry contract.
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = ("/root/reference/extensions-builtin/forge_legacy_preprocessors/"
       "annotator/oneformer/oneformer")


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_sine_pos_embed_parity():
    """_sine_pos_embed == PositionEmbeddingSine(normalize=True) (NCHW→NHWC)."""
    from forge_tpu.preprocessors.oneformer import _sine_pos_embed

    pe_mod = _load("modeling/transformer_decoder/position_encoding.py",
                   "ref_pe")
    h, w, dim = 7, 11, 32
    ref = pe_mod.PositionEmbeddingSine(dim // 2, normalize=True)
    got_ref = ref(torch.zeros(1, dim, h, w))[0].permute(1, 2, 0).numpy()
    got = _sine_pos_embed(h, w, dim)
    np.testing.assert_allclose(got, got_ref, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_ms_deform_sample_parity():
    """ms_deform_sample == ms_deform_attn_core_pytorch, including
    out-of-range sampling locations (zeros padding)."""
    import jax.numpy as jnp

    from forge_tpu.preprocessors.oneformer import ms_deform_sample

    fn_mod = _load("modeling/pixel_decoder/ops/functions/ms_deform_attn_func.py",
                   "ref_msda")
    rng = np.random.default_rng(3)
    shapes = [(6, 4), (3, 2)]
    s = sum(h * w for h, w in shapes)
    b, m, d, lq, npt = 2, 4, 8, 5, 3
    value = rng.standard_normal((b, s, m, d)).astype(np.float32)
    # locations straddle [0,1] so the zero-pad branch is exercised
    loc = rng.uniform(-0.2, 1.2, (b, lq, m, len(shapes), npt, 2)).astype(np.float32)
    aw = rng.random((b, lq, m, len(shapes), npt)).astype(np.float32)
    aw = aw / aw.sum(axis=(-2, -1), keepdims=True)

    ref = fn_mod.ms_deform_attn_core_pytorch(
        torch.from_numpy(value), torch.as_tensor(shapes),
        torch.from_numpy(loc), torch.from_numpy(aw)).numpy()
    got = np.asarray(ms_deform_sample(jnp.asarray(value), shapes,
                                      jnp.asarray(loc), jnp.asarray(aw)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


# ------------------------------------------------------- tiny end-to-end ---


def _tiny_params():
    """Minimal checkpoint-shaped tree: Swin depths [1,1,1,1] C=8, window 2,
    conv_dim = hidden = mask_dim = 32 (GroupNorm32-compatible), 6 queries,
    4+1 classes, 1 pixel-decoder encoder layer, 3 decoder layers."""
    rng = np.random.default_rng(11)

    def t(*shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def ln(c):
        return {"weight": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}

    def lin(ci, co):
        return {"weight": t(co, ci), "bias": np.zeros(co, np.float32)}

    def conv(kh, kw, ci, co, bias=True, gn=False):
        p = {"weight": t(kh, kw, ci, co)}
        if bias:
            p["bias"] = np.zeros(co, np.float32)
        if gn:
            p["norm"] = ln(co)
        return p

    def mha(c):
        return {"in_proj_weight": t(3 * c, c), "in_proj_bias": np.zeros(3 * c, np.float32),
                "out_proj": lin(c, c)}

    heads = 2

    def swin_block(c):
        return {"norm1": ln(c), "norm2": ln(c),
                "attn": {"qkv": lin(c, 3 * c), "proj": lin(c, c),
                         "relative_position_bias_table": t(9, heads)},
                "mlp": {"fc1": lin(c, 2 * c), "fc2": lin(2 * c, c)}}

    backbone = {"patch_embed": {"proj": conv(4, 4, 3, 8), "norm": ln(8)},
                "layers": {}}
    c = 8
    for i in range(4):
        lp = {"blocks": {"0": swin_block(c)}}
        if i < 3:
            lp["downsample"] = {"reduction": {"weight": t(2 * c, 4 * c)},
                                "norm": ln(4 * c)}
        backbone["layers"][str(i)] = lp
        backbone[f"norm{i}"] = ln(c)
        c *= 2
    cs = [8, 16, 32, 64]  # res2..res5 channels

    cd = 32  # conv_dim == hidden_dim == mask_dim
    npt = 2
    enc_layer = {"self_attn": {"sampling_offsets": lin(cd, 8 * 3 * npt * 2),
                               "attention_weights": lin(cd, 8 * 3 * npt),
                               "value_proj": lin(cd, cd),
                               "output_proj": lin(cd, cd)},
                 "norm1": ln(cd), "norm2": ln(cd),
                 "linear1": lin(cd, 64), "linear2": lin(64, cd)}
    pixel_decoder = {
        "input_proj": {str(i): {"0": conv(1, 1, ci, cd, bias=False), "1": ln(cd)}
                       for i, ci in enumerate([cs[3], cs[2], cs[1]])},
        "transformer": {"level_embed": t(3, cd),
                        "encoder": {"layers": {"0": enc_layer}}},
        "adapter_1": conv(1, 1, cs[0], cd, bias=False, gn=True),
        "layer_1": conv(3, 3, cd, cd, bias=False, gn=True),
        "mask_features": conv(1, 1, cd, cd),
    }

    def dec_layer():
        return {"self_attn": mha(cd), "norm1": ln(cd),
                "multihead_attn": mha(cd), "norm2": ln(cd),
                "linear1": lin(cd, 64), "linear2": lin(64, cd), "norm3": ln(cd)}

    nq, ncls = 6, 4
    predictor = {
        "query_embed": {"weight": t(nq, cd)},
        "level_embed": {"weight": t(3, cd)},
        "class_input_proj": conv(1, 1, cd, cd),
        "decoder_norm": ln(cd),
        "class_embed": lin(cd, ncls + 1),
        "mask_embed": {"layers": {"0": lin(cd, cd), "1": lin(cd, cd),
                                  "2": lin(cd, cd)}},
        "class_transformer": {"decoder": {"layers": {"0": dec_layer()},
                                          "norm": ln(cd)}},
        "transformer_self_attention_layers": {
            str(i): {"self_attn": mha(cd), "norm": ln(cd)} for i in range(3)},
        "transformer_cross_attention_layers": {
            str(i): {"multihead_attn": mha(cd), "norm": ln(cd)} for i in range(3)},
        "transformer_ffn_layers": {
            str(i): {"linear1": lin(cd, 64), "linear2": lin(64, cd),
                     "norm": ln(cd)} for i in range(3)},
    }
    params = {"backbone": backbone,
              "sem_seg_head": {"pixel_decoder": pixel_decoder,
                               "predictor": predictor},
              "task_mlp": {"layers": {"0": lin(77, cd), "1": lin(cd, cd)}}}
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


def test_end_to_end_tiny_weights(monkeypatch):
    """Full graph on a tiny synthetic checkpoint paints a palette map at the
    input resolution."""
    import forge_tpu.preprocessors.oneformer as of

    det = of.OneformerDetector("ade20k", model_dir="/nonexistent")
    det.MIN_TEST, det.MAX_TEST = 32, 64
    det.load(params=_tiny_params())
    img = (np.random.default_rng(5).random((48, 40, 3)) * 255).astype(np.uint8)
    out = det.detect(img)
    assert out.shape == (48, 40, 3) and out.dtype == np.uint8
    # every pixel is one of the first ncls palette entries
    pal = of.ADE20K_PALETTE[:5]
    flat = out.reshape(-1, 3)
    match = (flat[:, None, :] == pal[None]).all(-1).any(-1)
    assert match.all(), "non-palette pixel in output"


def test_task_tokens_match_clip_bpe():
    """Tokenized 'The task is semantic' is 77 long, sot/eot framed,
    zero padded (oneformer/data/tokenizer.py:86-116 semantics)."""
    from forge_tpu.preprocessors.oneformer import task_token_ids

    ids = task_token_ids("semantic")
    assert ids.shape == (77,)
    assert ids[0] == 49406  # <start_of_text>
    nz = ids[ids != 0]
    assert nz[-1] == 49407  # <end_of_text>
    assert (ids[len(nz):] == 0).all()


def test_registered():
    from forge_tpu.preprocessors import PREPROCESSORS

    assert "seg_ofade20k" in PREPROCESSORS
    assert "seg_ofcoco" in PREPROCESSORS
    assert "oneformer" in PREPROCESSORS  # alias
    assert PREPROCESSORS["seg_ofade20k"].needs_weights


def test_missing_weights_clean_error():
    import forge_tpu.preprocessors.oneformer as of

    det = of.OneformerDetector("coco", model_dir="/nonexistent")
    with pytest.raises(RuntimeError):
        det.detect(np.zeros((64, 64, 3), np.uint8))
