"""DensePose (R50-FPN DeepLab) annotator in JAX.

Re-expression of the reference's torchscript-only densepose model
(extensions-builtin/forge_legacy_preprocessors/annotator/densepose/__init__.py:22
runs `densepose_r50_fpn_dl.torchscript`; the network inside is detectron2's
GeneralizedRCNN with a DensePose DeepLab head). The torchscript blob cannot
be ported line-by-line even in principle, so — like sapiens — the graph is
rebuilt from the detectron2 checkpoint layout and every channel count is
derived from the state dict.

Stages:
  1. ResNet-50 (FrozenBN) stem+res2..res5 → C2..C5.
  2. FPN: 1×1 laterals + nearest ×2 top-down + 3×3 outputs → P2..P5,
     P6 = stride-2 maxpool of P5 (RPN only).
  3. RPN head per level (shared 3×3 conv → objectness[A] + deltas[4A]);
     anchor decode + per-level top-k + NMS run host-side in numpy
     (data-dependent shapes stay off the TPU).
  4. Box head: ROIAlign 7×7 over P2..P5 (level by detectron2's canonical
     box-size rule) → fc1/fc2 → person score + box deltas → host NMS.
  5. DensePose DeepLab head on the final boxes: ROIAlign 28×28 →
     ASPP + N 3×3 convs → 4 deconv predictors (coarse_segm 2, fine_segm
     C=25, u, v) at 2× head resolution.
  6. IUV→image painting matches densepose.py MatrixVisualizer.visualize:
     bilinear part/uv resample into the box, fine-label argmax masked by
     coarse person mask, part index × 255/24 through the viridis colormap,
     background set to viridis(0) = RGB(68,1,84).

TPU-first deviations (documented, behavior-preserving at annotator level):
  - input is resized+padded to a fixed square canvas (static jit shapes)
    instead of detectron2's variable shortest-edge batching;
  - ROIAlign uses a fixed 2×2 sample grid per bin (detectron2's
    sampling_ratio=0 adapts per-box; the annotator output is an argmax
    over 112² logits, insensitive to the sub-bin sample count);
  - boxes are padded to MAX_DET for the jitted dense head, invalid rows
    masked out host-side.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# detectron2 defaults for densepose_rcnn_R_50_FPN_DL_s1x
_PIXEL_MEAN = np.array([103.53, 116.28, 123.675], np.float32)  # BGR
_ANCHOR_SIZES = (32, 64, 128, 256, 512)  # per level P2..P6
_ASPECTS = (0.5, 1.0, 2.0)
_PRE_NMS_TOPK = 1000
_POST_NMS_TOPK = 1000
_RPN_NMS_T = 0.7
_SCORE_T = 0.5
_BOX_NMS_T = 0.5
_MAX_DET = 8
_CANVAS = 800  # square static canvas
_N_PARTS = 24


# --------------------------------------------------------------------------
# numpy box utilities (host side — data-dependent shapes)

def _decode(anchors: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """detectron2 Box2BoxTransform.apply_deltas, weights (1,1,1,1)."""
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * w
    cy = anchors[:, 1] + 0.5 * h
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    dw = np.minimum(dw, 4.135)  # log(1000/16) scale clamp
    dh = np.minimum(dh, 4.135)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = np.exp(dw) * w
    ph = np.exp(dh) * h
    return np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1)


def _nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> List[int]:
    order = np.argsort(-scores)
    keep: List[int] = []
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-9)
        order = rest[iou <= thresh]
    return keep


def _anchors_for(h: int, w: int, stride: int, size: int) -> np.ndarray:
    """Grid of A=3 anchors (detectron2 DefaultAnchorGenerator)."""
    cell: List[List[float]] = []
    area = float(size * size)
    for ar in _ASPECTS:
        aw = np.sqrt(area / ar)
        ah = aw * ar
        cell.append([-aw / 2, -ah / 2, aw / 2, ah / 2])
    cell_a = np.array(cell, np.float32)  # [A,4]
    sx = (np.arange(w, dtype=np.float32) * stride)
    sy = (np.arange(h, dtype=np.float32) * stride)
    shift = np.stack(np.broadcast_arrays(
        sx[None, :], sy[:, None], sx[None, :], sy[:, None]), axis=-1)
    return (shift[:, :, None, :] + cell_a[None, None]).reshape(-1, 4)


# --------------------------------------------------------------------------
# JAX network pieces

def _frozen_bn(x, p):
    scale = p["norm"]["weight"] * jax.lax.rsqrt(p["norm"]["running_var"] + 1e-5)
    return x * scale + (p["norm"]["bias"] - p["norm"]["running_mean"] * scale)


def _conv(x, p, stride=1, pad="SAME", dilation=1, bn=True, relu=False):
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bn and "norm" in p:
        y = _frozen_bn(y, p)
    elif "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return jax.nn.relu(y) if relu else y


def _bottleneck(x, p, stride=1):
    out = _conv(x, p["conv1"], stride=1, relu=True)
    out = _conv(out, p["conv2"], stride=stride, relu=True)
    out = _conv(out, p["conv3"], stride=1)
    sc = _conv(x, p["shortcut"], stride=stride) if "shortcut" in p else x
    return jax.nn.relu(out + sc)


def _resnet_fpn(params, x):
    """x [1,H,W,3] BGR-normalized → {2: P2, ..., 6: P6} (NHWC, 256ch)."""
    bu = params["backbone"]["bottom_up"]
    h = _conv(x, bu["stem"]["conv1"], stride=2, relu=True)
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
    feats = {}
    for si, stage in enumerate(("res2", "res3", "res4", "res5")):
        blocks = bu[stage]
        for bi in range(len(blocks)):
            h = _bottleneck(h, blocks[str(bi)],
                            stride=(2 if bi == 0 and si > 0 else 1))
        feats[si + 2] = h
    fpn = params["backbone"]
    out: Dict[int, Any] = {}
    prev = None
    for lvl in (5, 4, 3, 2):
        lat = _conv(feats[lvl], fpn[f"fpn_lateral{lvl}"], bn=False)
        if prev is not None:
            up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
            lat = lat + up[:, :lat.shape[1], :lat.shape[2]]
        prev = lat
        out[lvl] = _conv(lat, fpn[f"fpn_output{lvl}"], bn=False)
    out[6] = jax.lax.reduce_window(
        out[5], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1), "SAME")
    return out


def _rpn_level(params, feat):
    rh = params["proposal_generator"]["rpn_head"]
    t = _conv(feat, rh["conv"], bn=False, relu=True)
    logits = _conv(t, rh["objectness_logits"], bn=False)
    deltas = _conv(t, rh["anchor_deltas"], bn=False)
    return logits, deltas


def _roi_align(feat, boxes, out_size: int, stride: int):
    """[N,4] xyxy (canvas coords) → [N, out, out, C]; fixed 2×2 samples/bin,
    bilinear, aligned=True (detectron2 ROIAlignV2 half-pixel offset)."""
    n = boxes.shape[0]
    c = feat.shape[-1]
    fh, fw = feat.shape[1], feat.shape[2]
    b = boxes / stride  # feature coords
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = jnp.maximum(x1 - x0, 1e-4) / out_size
    bh = jnp.maximum(y1 - y0, 1e-4) / out_size
    # sample positions: per bin 2×2 grid at (±0.25) of the bin
    gi = jnp.arange(out_size, dtype=jnp.float32)
    offs = jnp.array([0.25, 0.75], jnp.float32)
    # ys [N, out, 2]
    ys = y0[:, None, None] + (gi[None, :, None] + offs[None, None]) * bh[:, None, None]
    xs = x0[:, None, None] + (gi[None, :, None] + offs[None, None]) * bw[:, None, None]
    ys = ys.reshape(n, out_size * 2) - 0.5  # aligned=True half pixel
    xs = xs.reshape(n, out_size * 2) - 0.5

    def bilin(coord, size):
        c0 = jnp.clip(jnp.floor(coord), 0, size - 1)
        c1 = jnp.clip(c0 + 1, 0, size - 1)
        f = jnp.clip(coord - c0, 0.0, 1.0)
        return c0.astype(jnp.int32), c1.astype(jnp.int32), f

    yl, yh, fy = bilin(ys, fh)
    xl, xh, fx = bilin(xs, fw)
    f0 = feat[0]  # [fh, fw, C]

    def one_box(yl_, yh_, fy_, xl_, xh_, fx_):
        # gather rows then cols: [S, fw, C] → [S, S, C]
        rows_l = f0[yl_]
        rows_h = f0[yh_]
        rows = rows_l * (1 - fy_)[:, None, None] + rows_h * fy_[:, None, None]
        cols_l = rows[:, xl_]
        cols_h = rows[:, xh_]
        g = cols_l * (1 - fx_)[None, :, None] + cols_h * fx_[None, :, None]
        # average the 2×2 samples per bin
        g = g.reshape(out_size, 2, out_size, 2, c).mean(axis=(1, 3))
        return g

    return jax.vmap(one_box)(yl, yh, fy, xl, xh, fx)


def _roi_align_multilevel(params, pyramid, boxes, out_size):
    """detectron2 level assignment: lvl = floor(4 + log2(sqrt(area)/224)),
    clamped to [2,5]; computed per box, gathered with lax.switch-free
    masking (all levels computed for the tiny MAX_DET batch, then picked)."""
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    lvl = jnp.floor(4.0 + jnp.log2(jnp.sqrt(areas) / 224.0 + 1e-8))
    lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32)
    outs = jnp.stack([
        _roi_align(pyramid[l], boxes, out_size, 2 ** l) for l in (2, 3, 4, 5)
    ])  # [4, N, s, s, C]
    sel = jax.nn.one_hot(lvl - 2, 4, dtype=outs.dtype)  # [N,4]
    return jnp.einsum("lnhwc,nl->nhwc", outs, sel)


def _box_head(params, pooled):
    rh = params["roi_heads"]
    n = pooled.shape[0]
    h = pooled.reshape(n, -1)
    h = jax.nn.relu(h @ rh["box_head"]["fc1"]["weight"].T
                    + rh["box_head"]["fc1"]["bias"])
    h = jax.nn.relu(h @ rh["box_head"]["fc2"]["weight"].T
                    + rh["box_head"]["fc2"]["bias"])
    scores = h @ rh["box_predictor"]["cls_score"]["weight"].T \
        + rh["box_predictor"]["cls_score"]["bias"]
    deltas = h @ rh["box_predictor"]["bbox_pred"]["weight"].T \
        + rh["box_predictor"]["bbox_pred"]["bias"]
    return jax.nn.softmax(scores, axis=-1), deltas


def _aspp(p, x):
    """DeepLab ASPP as laid out in the DensePose DL head state dict."""
    branches = []
    for key in sorted(p.keys()):
        q = p[key]
        if key.startswith("ASPP_pool") or "pooling" in key:
            g = x.mean(axis=(1, 2), keepdims=True)
            g = _conv(g, q, bn=False, relu=True)
            branches.append(jnp.broadcast_to(
                g, (x.shape[0], x.shape[1], x.shape[2], g.shape[-1])))
        else:
            k = q["weight"].shape[0]
            dil = int(q.get("dilation", 0)) or {1: 1}.get(k, 0)
            if not dil:  # derive: ASPP 3×3 branches run at rates 6/12/56...
                dil = {"ASPP1": 1, "ASPP2": 6, "ASPP3": 12, "ASPP4": 18}.get(
                    key, 1)
            branches.append(_conv(x, q, dilation=dil if k == 3 else 1,
                                  bn=False, relu=True))
    return jnp.concatenate(branches, axis=-1)


def _densepose_head(params, pooled):
    """[N,28,28,256] → coarse[N,h,w,2], fine[N,h,w,25], u, v."""
    rh = params["roi_heads"]
    h = pooled
    head = rh.get("densepose_head", {})
    if "ASPP" in head:
        h = _aspp(head["ASPP"], h)
        if "project" in head:
            h = _conv(h, head["project"], bn=False, relu=True)
    i = 1
    while f"body_conv_fcn{i}" in head or f"conv_fcn{i}" in head:
        key = f"body_conv_fcn{i}" if f"body_conv_fcn{i}" in head else f"conv_fcn{i}"
        h = _conv(h, head[key], bn=False, relu=True)
        i += 1
    pred = rh["densepose_predictor"]
    from ..ops import nn as _nn

    def deconv(x, p):  # torch ConvTranspose2d(k=4, s=2, p=1)
        return _nn.conv2d_transpose(x, p, stride=2, padding=1)

    coarse = deconv(h, pred["ann_index_lowres"])
    fine = deconv(h, pred["index_uv_lowres"])
    u = deconv(h, pred["u_lowres"])
    v = deconv(h, pred["v_lowres"])

    def up2(t):  # predictor's final interp2d scale_factor=2 bilinear
        n, hh, ww, c = t.shape
        return jax.image.resize(t, (n, hh * 2, ww * 2, c), "bilinear")

    return up2(coarse), up2(fine), up2(u), up2(v)


# --------------------------------------------------------------------------
# colormap + painting (reference densepose.py MatrixVisualizer.visualize)

def paint_iuv(canvas: np.ndarray, labels: np.ndarray,
              box_xywh: Tuple[int, int, int, int],
              cmap: str = "viridis") -> np.ndarray:
    """Paint part labels into the RGB canvas exactly like MatrixVisualizer
    with alpha=1, val_scale=255/24: value = label*255/24 through the cv2
    colormap; pixels with label 0 keep the canvas."""
    import cv2

    cmap_id = (cv2.COLORMAP_VIRIDIS if cmap == "viridis"
               else cv2.COLORMAP_PARULA)
    x, y, w, h = box_xywh
    ch, cw = canvas.shape[:2]
    x = max(0, min(x, cw - 1))
    y = max(0, min(y, ch - 1))
    w = min(w, cw - x)
    h = min(h, ch - y)
    if w <= 0 or h <= 0:
        return canvas
    lab = labels[:h, :w]
    scaled = np.clip(lab.astype(np.float32) * (255.0 / _N_PARTS),
                     0, 255).astype(np.uint8)
    colored = cv2.applyColorMap(scaled, cmap_id)[..., ::-1]  # BGR → RGB
    region = canvas[y:y + h, x:x + w]
    mask = lab > 0
    region[mask] = colored[mask]
    return canvas


# --------------------------------------------------------------------------
# detector

class DensePoseDetector:
    """Shape-derived DensePose R50-FPN-DL; weights from a detectron2-format
    checkpoint (model.safetensors / .pt with `roi_heads.densepose_*` keys)
    under models/densepose/."""

    def __init__(self, model_dir: str = "models/densepose"):
        self.model_dir = model_dir
        self.params = None
        self._fwd = None

    def _candidates(self):
        if not os.path.isdir(self.model_dir):
            return []
        return sorted(f for f in os.listdir(self.model_dir)
                      if f.endswith((".pt", ".pth", ".safetensors")))

    def load(self, params: Optional[Mapping[str, Any]] = None):
        if self.params is not None:
            return
        if params is None:
            cands = self._candidates()
            if not cands:
                return
            from ..core.state_dict import load_state_dict, transform_for_jax
            from ..core.tree import nest

            sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
            sd = {k[len("model."):] if k.startswith("model.") else k: v
                  for k, v in sd.items()}
            params = nest({k: jnp.asarray(v)
                           for k, v in transform_for_jax(sd).items()})
        self.params = params
        p = params

        @jax.jit
        def rpn(x):
            pyr = _resnet_fpn(p, x)
            per_level = {l: _rpn_level(p, pyr[l]) for l in pyr}
            return per_level, pyr

        @jax.jit
        def box_head(pyr, b):
            pooled = _roi_align_multilevel(p, pyr, b, 7)
            return _box_head(p, pooled)

        @jax.jit
        def dense(pyr, b):
            pooled = _roi_align_multilevel(p, pyr, b, 28)
            return _densepose_head(p, pooled)

        self._rpn_jit, self._box_jit, self._dense_jit = rpn, box_head, dense

    def detect(self, img: np.ndarray, cmap: str = "viridis") -> np.ndarray:
        """uint8 RGB [H,W,3] → uint8 RGB hint image (black canvas + painted
        IUV part charts; viridis background (68,1,84) per the reference)."""
        self.load()
        if self.params is None:
            raise RuntimeError(
                f"no DensePose checkpoint under {self.model_dir}")
        H, W = img.shape[:2]
        scale = _CANVAS / max(H, W)
        nh, nw = int(round(H * scale)), int(round(W * scale))
        import cv2

        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas_in = np.zeros((_CANVAS, _CANVAS, 3), np.float32)
        # detectron2 feeds BGR minus pixel mean
        canvas_in[:nh, :nw] = resized[..., ::-1].astype(np.float32) - _PIXEL_MEAN
        x = jnp.asarray(canvas_in[None])

        per_level, pyramid = self._rpn_jit(x)
        logits = {l: np.asarray(v[0]) for l, v in per_level.items()}
        deltas = {l: np.asarray(v[1]) for l, v in per_level.items()}
        boxes = self._proposals_to_boxes(logits, deltas, (nh, nw), pyramid)
        canvas = np.zeros((H, W, 3), np.uint8)
        if boxes.shape[0]:
            padded = np.zeros((_MAX_DET, 4), np.float32)
            padded[:boxes.shape[0]] = boxes[:_MAX_DET]
            coarse, fine, _u, _v = [
                np.asarray(t)
                for t in self._dense_jit(pyramid, jnp.asarray(padded))]
            for bi in range(min(boxes.shape[0], _MAX_DET)):
                bx = boxes[bi] / scale  # back to original image coords
                x0, y0 = int(bx[0]), int(bx[1])
                w = max(int(bx[2] - bx[0]), 1)
                h = max(int(bx[3] - bx[1]), 1)
                lab = _labels_for_box(coarse[bi], fine[bi], h, w)
                paint_iuv(canvas, lab, (x0, y0, w, h), cmap=cmap)
        if cmap == "viridis":
            # reference __init__.py:44-46 — per-channel zero → viridis(0)
            for c, v in enumerate((68, 1, 84)):
                chan = canvas[:, :, c]
                chan[chan == 0] = v
        return canvas

    def _proposals_to_boxes(self, logits, deltas, hw, pyramid) -> np.ndarray:
        nh, nw = hw
        all_boxes, all_scores = [], []
        for li, lvl in enumerate((2, 3, 4, 5, 6)):
            if lvl not in logits:
                continue
            lg = logits[lvl][0]  # [h,w,A]
            dl = deltas[lvl][0]  # [h,w,4A]
            h, w, a = lg.shape
            anchors = _anchors_for(h, w, 2 ** lvl, _ANCHOR_SIZES[li])
            lg_f = lg.reshape(-1)
            dl_f = dl.reshape(h * w, a, 4).reshape(-1, 4)
            k = min(_PRE_NMS_TOPK, lg_f.size)
            top = np.argpartition(-lg_f, k - 1)[:k]
            bx = _decode(anchors[top], dl_f[top])
            bx[:, 0::2] = bx[:, 0::2].clip(0, nw)
            bx[:, 1::2] = bx[:, 1::2].clip(0, nh)
            sc = lg_f[top]
            # detectron2 find_top_rpn_proposals drops empty boxes (boxes
            # fully outside the image clip to zero-area corner points)
            nonempty = (bx[:, 2] > bx[:, 0]) & (bx[:, 3] > bx[:, 1])
            bx, sc = bx[nonempty], sc[nonempty]
            if not bx.shape[0]:
                continue
            keep = _nms(bx, sc, _RPN_NMS_T)
            all_boxes.append(bx[keep])
            all_scores.append(sc[keep])
        if not all_boxes:
            return np.zeros((0, 4), np.float32)
        boxes = np.concatenate(all_boxes)
        scores = np.concatenate(all_scores)
        order = np.argsort(-scores)[:_POST_NMS_TOPK]
        boxes, scores = boxes[order], scores[order]
        # second stage: box head on a fixed-size padded batch of the best
        # proposals (static jit shapes)
        n = min(64, boxes.shape[0])
        padded = np.zeros((64, 4), np.float32)
        padded[:n] = boxes[:n]
        probs, bdeltas = [np.asarray(t)
                          for t in self._box_jit(pyramid, jnp.asarray(padded))]
        person = probs[:n, 0]  # class 0 = person (num_classes=1 + bg)
        sel = person > _SCORE_T
        final = _decode(padded[:n][sel], bdeltas[:n][sel][:, :4] /
                        np.array([10.0, 10.0, 5.0, 5.0], np.float32))
        if final.shape[0] == 0:
            return np.zeros((0, 4), np.float32)
        final[:, 0::2] = final[:, 0::2].clip(0, nw)
        final[:, 1::2] = final[:, 1::2].clip(0, nh)
        fsc = person[sel]
        nonempty = (final[:, 2] > final[:, 0]) & (final[:, 3] > final[:, 1])
        final, fsc = final[nonempty], fsc[nonempty]
        if final.shape[0] == 0:
            return np.zeros((0, 4), np.float32)
        keep = _nms(final, fsc, _BOX_NMS_T)
        return final[keep].astype(np.float32)


def _labels_for_box(coarse: np.ndarray, fine: np.ndarray,
                    h: int, w: int) -> np.ndarray:
    """resample_fine_and_coarse_segm_tensors_to_bbox in numpy: bilinear to
    (h,w), fine argmax masked by coarse-argmax>0."""
    import cv2

    cb = cv2.resize(coarse, (w, h), interpolation=cv2.INTER_LINEAR)
    fb = cv2.resize(fine, (w, h), interpolation=cv2.INTER_LINEAR)
    person = cb.argmax(axis=-1) > 0
    return fb.argmax(axis=-1) * person


_DET: Optional[DensePoseDetector] = None


def _densepose(img, res, a, b, cmap="viridis"):
    global _DET
    if _DET is None:
        _DET = DensePoseDetector()
    from . import resize_image

    img = resize_image(img, res)
    out = _DET.detect(img, cmap=cmap)
    return out.astype(np.float32) / 255.0


def _register():
    from . import Preprocessor, register

    register(Preprocessor("densepose (pruple bg & purple torso)",
                          lambda i, r, a, b: _densepose(i, r, a, b, "viridis"),
                          tags=("OpenPose",), needs_weights=True),
             aliases=("densepose",))
    register(Preprocessor("densepose_parula (black bg & blue torso)",
                          lambda i, r, a, b: _densepose(i, r, a, b, "parula"),
                          tags=("OpenPose",), needs_weights=True))


_register()
