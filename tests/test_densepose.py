"""DensePose annotator: postprocess parity vs the reference's in-tree torch
code (annotator/densepose/densepose.py) + end-to-end shape/behavior on tiny
synthetic weights. The network itself has no in-tree reference (the reference
runs a torchscript blob), so — like sapiens — the graph is gated by
shape-flow and postprocess parity, not weight-level goldens.
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = ("/root/reference/extensions-builtin/forge_legacy_preprocessors/"
       "annotator/densepose/densepose.py")


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_densepose", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.skipif(not os.path.isfile(REF), reason="reference not present")
def test_labels_resample_parity():
    """_labels_for_box == resample_fine_and_coarse_segm_tensors_to_bbox."""
    from forge_tpu.preprocessors.densepose import _labels_for_box

    ref = _load_ref()
    rng = np.random.default_rng(0)
    coarse = rng.standard_normal((1, 2, 28, 28)).astype(np.float32)
    fine = rng.standard_normal((1, 25, 28, 28)).astype(np.float32)
    h, w = 93, 57
    ref_labels = ref.resample_fine_and_coarse_segm_tensors_to_bbox(
        torch.from_numpy(fine), torch.from_numpy(coarse), (0, 0, w, h)
    ).squeeze(0).numpy()
    got = _labels_for_box(coarse[0].transpose(1, 2, 0),
                          fine[0].transpose(1, 2, 0), h, w)
    # bilinear tie-breaks at argmax boundaries differ at isolated pixels
    agree = (got == ref_labels).mean()
    assert agree > 0.99, f"label agreement {agree:.4f}"


@pytest.mark.skipif(not os.path.isfile(REF), reason="reference not present")
def test_paint_matches_reference_visualizer():
    """paint_iuv == MatrixVisualizer(alpha=1, val_scale=255/24).visualize
    (+ BGR→RGB, since the repo canvas is RGB throughout)."""
    import cv2

    from forge_tpu.preprocessors.densepose import paint_iuv

    ref = _load_ref()
    rng = np.random.default_rng(1)
    h, w = 40, 30
    labels = rng.integers(0, 25, (h, w)).astype(np.uint8)
    vis = ref.MatrixVisualizer(inplace=True, cmap=cv2.COLORMAP_VIRIDIS,
                               val_scale=255.0 / 24, alpha=1)
    canvas_ref = np.zeros((64, 64, 3), np.uint8)
    mask = (labels > 0).astype(np.uint8)
    vis.visualize(canvas_ref, mask, labels, (5, 8, w, h))
    canvas_ref = cv2.cvtColor(canvas_ref, cv2.COLOR_BGR2RGB)

    canvas = np.zeros((64, 64, 3), np.uint8)
    paint_iuv(canvas, labels, (5, 8, w, h), cmap="viridis")
    assert np.array_equal(canvas, canvas_ref)


def _tiny_params():
    """Minimal detectron2-shaped tree: 1 block per stage, tiny channels."""
    rng = np.random.default_rng(42)

    def conv(kh, kw, ci, co, norm=True, bias=False):
        p = {"weight": rng.standard_normal((kh, kw, ci, co)).astype(np.float32) * 0.1}
        if norm:
            p["norm"] = {"weight": np.ones(co, np.float32),
                         "bias": np.zeros(co, np.float32),
                         "running_mean": np.zeros(co, np.float32),
                         "running_var": np.ones(co, np.float32)}
        if bias:
            p["bias"] = np.zeros(co, np.float32)
        return p

    def block(ci, cm, co, shortcut):
        b = {"conv1": conv(1, 1, ci, cm), "conv2": conv(3, 3, cm, cm),
             "conv3": conv(1, 1, cm, co)}
        if shortcut:
            b["shortcut"] = conv(1, 1, ci, co)
        return b

    f = 16  # FPN channels
    bu = {"stem": {"conv1": conv(7, 7, 3, 8)},
          "res2": {"0": block(8, 4, 16, True)},
          "res3": {"0": block(16, 4, 32, True)},
          "res4": {"0": block(32, 4, 64, True)},
          "res5": {"0": block(64, 4, 128, True)}}
    backbone = {"bottom_up": bu}
    for lvl, ci in zip((2, 3, 4, 5), (16, 32, 64, 128)):
        backbone[f"fpn_lateral{lvl}"] = conv(1, 1, ci, f, norm=False, bias=True)
        backbone[f"fpn_output{lvl}"] = conv(3, 3, f, f, norm=False, bias=True)

    def lin(ci, co, bias_val=0.0):
        return {"weight": rng.standard_normal((co, ci)).astype(np.float32) * 0.02,
                "bias": np.full(co, bias_val, np.float32)}

    params = {
        "backbone": backbone,
        "proposal_generator": {"rpn_head": {
            "conv": conv(3, 3, f, f, norm=False, bias=True),
            "objectness_logits": conv(1, 1, f, 3, norm=False, bias=True),
            "anchor_deltas": conv(1, 1, f, 12, norm=False, bias=True),
        }},
        "roi_heads": {
            "box_head": {"fc1": lin(7 * 7 * f, 32), "fc2": lin(32, 32)},
            # person logit bias high → every proposal passes the 0.5 gate
            "box_predictor": {
                "cls_score": {"weight": np.zeros((2, 32), np.float32),
                              "bias": np.array([10.0, 0.0], np.float32)},
                "bbox_pred": {"weight": np.zeros((4, 32), np.float32),
                              "bias": np.zeros(4, np.float32)}},
            "densepose_head": {
                "conv_fcn1": conv(3, 3, f, 8, norm=False, bias=True)},
            "densepose_predictor": {
                # ConvTranspose post-transform layout [kh,kw,O,I]
                "ann_index_lowres": {
                    "weight": rng.standard_normal((4, 4, 2, 8)).astype(np.float32) * 0.1,
                    "bias": np.zeros(2, np.float32)},
                "index_uv_lowres": {
                    "weight": rng.standard_normal((4, 4, 25, 8)).astype(np.float32) * 0.1,
                    "bias": np.zeros(25, np.float32)},
                "u_lowres": {
                    "weight": rng.standard_normal((4, 4, 25, 8)).astype(np.float32) * 0.1,
                    "bias": np.zeros(25, np.float32)},
                "v_lowres": {
                    "weight": rng.standard_normal((4, 4, 25, 8)).astype(np.float32) * 0.1,
                    "bias": np.zeros(25, np.float32)},
            },
        },
    }
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


def test_end_to_end_tiny_weights(monkeypatch):
    """Random tiny net, forced-positive person classifier: the full
    RPN→boxes→dense-head→paint path runs and paints parts on the canvas."""
    import forge_tpu.preprocessors.densepose as dp

    monkeypatch.setattr(dp, "_CANVAS", 128)
    det = dp.DensePoseDetector(model_dir="/nonexistent")
    det.load(params=_tiny_params())
    img = (np.random.default_rng(7).random((96, 80, 3)) * 255).astype(np.uint8)
    out = det.detect(img)
    assert out.shape == (96, 80, 3) and out.dtype == np.uint8
    # viridis background fill — no pure-zero channel survives
    assert out[..., 0].min() >= 1 or (out[..., 0] != 0).all()
    # some pixels were painted with a non-background part color
    bg = np.array([68, 1, 84], np.uint8)
    painted = (out != bg).any(axis=-1)
    assert painted.any(), "no detection painted despite forced person logit"


def test_registered_with_aliases():
    from forge_tpu.preprocessors import PREPROCESSORS

    assert "densepose (pruple bg & purple torso)" in PREPROCESSORS
    assert "densepose" in PREPROCESSORS
    assert "densepose_parula (black bg & blue torso)" in PREPROCESSORS
    assert PREPROCESSORS["densepose"].needs_weights
