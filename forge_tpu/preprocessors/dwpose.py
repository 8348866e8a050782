"""DWPose whole-body pose annotator (dw_openpose_full).

The reference runs two ONNX models through cv2.dnn — a YOLOX person
detector + the RTMPose SimCC whole-body estimator — with numpy pre/post
processing (extensions-builtin/forge_legacy_preprocessors/annotator/openpose/
{wholebody.py, cv_ox_det.py, cv_ox_pose.py}). This module keeps the same
execution vehicle (cv2.dnn on local ONNX files: no torch, no egress) and
re-expresses the published algorithms: YOLOX grid decode + class-aware NMS,
top-down affine crop at 288×384, SimCC argmax decode, the mmpose→openpose
keypoint remap with the synthesized neck joint, and the 68→70 face padding.

Checkpoints: models/dwpose/yolox_l.onnx + models/dwpose/dw-ll_ucoco_384.onnx.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from .openpose import COLORS, HAND_EDGES, LIMB_SEQ


# -- YOLOX person detection ---------------------------------------------------


def _nms(boxes: np.ndarray, scores: np.ndarray, thr: float) -> List[int]:
    order = scores.argsort()[::-1]
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(0.0, xx2 - xx1 + 1) * np.maximum(0.0, yy2 - yy1 + 1)
        iou = inter / (areas[i] + areas[rest] - inter)
        order = rest[iou <= thr]
    return keep


def _yolox_decode(raw: np.ndarray, size: int = 640) -> np.ndarray:
    """[N, 5+classes] grid-relative predictions → absolute xywh."""
    grids, strides_all = [], []
    for stride in (8, 16, 32):
        n = size // stride
        xv, yv = np.meshgrid(np.arange(n), np.arange(n))
        grids.append(np.stack((xv, yv), 2).reshape(-1, 2))
        strides_all.append(np.full((n * n, 1), stride))
    grid = np.concatenate(grids, 0)
    stride = np.concatenate(strides_all, 0)
    out = raw.copy()
    out[:, :2] = (out[:, :2] + grid) * stride
    out[:, 2:4] = np.exp(out[:, 2:4]) * stride
    return out


def detect_people(session, img: np.ndarray, size: int = 640,
                  score_thr: float = 0.3) -> np.ndarray:
    """→ [N,4] person boxes (xyxy, original-image coords)."""
    import cv2

    r = min(size / img.shape[0], size / img.shape[1])
    canvas = np.full((size, size, 3), 114, np.uint8)
    rs = cv2.resize(img, (int(img.shape[1] * r), int(img.shape[0] * r)),
                    interpolation=cv2.INTER_LINEAR)
    canvas[: rs.shape[0], : rs.shape[1]] = rs
    inp = canvas.transpose(2, 0, 1)[None].astype(np.float32)
    session.setInput(inp)
    raw = session.forward(session.getUnconnectedOutLayersNames())[0][0]
    pred = _yolox_decode(raw, size)
    xywh, obj, cls = pred[:, :4], pred[:, 4:5], pred[:, 5:]
    scores = (obj * cls)[:, 0]  # person class
    boxes = np.stack([xywh[:, 0] - xywh[:, 2] / 2, xywh[:, 1] - xywh[:, 3] / 2,
                      xywh[:, 0] + xywh[:, 2] / 2, xywh[:, 1] + xywh[:, 3] / 2],
                     axis=1) / r
    ok = scores > 0.1
    boxes, scores = boxes[ok], scores[ok]
    if not len(boxes):
        return np.zeros((0, 4), np.float32)
    keep = _nms(boxes, scores, 0.45)
    boxes, scores = boxes[keep], scores[keep]
    return boxes[scores > score_thr]


# -- RTMPose SimCC whole-body estimation --------------------------------------


def _affine_crop(img, box, out_w=288, out_h=384):
    """mmpose top-down crop: pad the box 1.25×, fix aspect, warp."""
    import cv2

    x0, y0, x1, y1 = box
    center = np.array([(x0 + x1) / 2, (y0 + y1) / 2], np.float32)
    scale = np.array([(x1 - x0), (y1 - y0)], np.float32) * 1.25
    ar = out_w / out_h
    w, h = scale
    scale = np.array([w, w / ar], np.float32) if w > h * ar \
        else np.array([h * ar, h], np.float32)
    src_dir = np.array([0.0, scale[0] * -0.5], np.float32)
    dst_dir = np.array([0.0, out_w * -0.5], np.float32)
    src = np.stack([center, center + src_dir, 0 * center], 0).astype(np.float32)
    src[2] = src[1] + np.asarray([-(src[0] - src[1])[1], (src[0] - src[1])[0]])
    dst = np.stack([[out_w / 2, out_h / 2],
                    np.asarray([out_w / 2, out_h / 2]) + dst_dir,
                    [0, 0]], 0).astype(np.float32)
    dst[2] = dst[1] + np.asarray([-(dst[0] - dst[1])[1], (dst[0] - dst[1])[0]])
    mat = cv2.getAffineTransform(src, dst)
    crop = cv2.warpAffine(img, mat, (out_w, out_h), flags=cv2.INTER_LINEAR)
    return crop, center, scale


def estimate_pose(session, img: np.ndarray, boxes: np.ndarray,
                  out_w: int = 288, out_h: int = 384):
    """→ (keypoints [N,133,2], scores [N,133]) in image coords."""
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    if not len(boxes):
        boxes = np.asarray([[0, 0, img.shape[1], img.shape[0]]], np.float32)
    kps, scs = [], []
    for box in boxes:
        crop, center, scale = _affine_crop(img, box, out_w, out_h)
        inp = ((crop - mean) / std).transpose(2, 0, 1)[None].astype(np.float32)
        session.setInput(inp)
        simcc_x, simcc_y = session.forward(session.getUnconnectedOutLayersNames())
        sx, sy = simcc_x[0], simcc_y[0]  # [K, W·ratio], [K, H·ratio]
        locs = np.stack([sx.argmax(1), sy.argmax(1)], -1).astype(np.float32)
        vals = np.minimum(sx.max(1), sy.max(1))
        locs[vals <= 0] = -1
        locs /= 2.0  # simcc_split_ratio
        locs = locs / np.asarray([out_w, out_h]) * scale + center - scale / 2
        kps.append(locs)
        scs.append(vals)
    return np.stack(kps), np.stack(scs)


def to_openpose_layout(kps: np.ndarray, scores: np.ndarray) -> np.ndarray:
    """[N,133,2]+[N,133] coco-wholebody → [N,134,3] openpose layout with the
    synthesized neck (reference wholebody.py:38-55)."""
    info = np.concatenate([kps, scores[..., None]], -1)
    neck = info[:, [5, 6]].mean(1)
    neck[:, 2] = np.logical_and(info[:, 5, 2] > 0.3, info[:, 6, 2] > 0.3).astype(np.float32)
    info = np.insert(info, 17, neck, axis=1)
    mmpose_idx = [17, 6, 8, 10, 7, 9, 12, 14, 16, 13, 15, 2, 1, 4, 3]
    openpose_idx = [1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14, 15, 16, 17]
    out = info.copy()
    out[:, openpose_idx] = info[:, mmpose_idx]
    return out


def draw_pose(canvas: np.ndarray, info: np.ndarray,
              include_body=True, include_hand=True, include_face=True) -> np.ndarray:
    """Render the openpose-style map from [N,134,3] keypoint rows."""
    import colorsys

    import cv2

    h, w = canvas.shape[:2]
    for person in info:
        body = person[:18]
        if include_body:
            for k, (ia, ib) in enumerate([(a - 1, b - 1) for a, b in LIMB_SEQ[:17]]):
                a, b = body[ia], body[ib]
                if a[2] < 0.3 or b[2] < 0.3:
                    continue
                mx, my = (a[0] + b[0]) / 2, (a[1] + b[1]) / 2
                length = np.hypot(a[0] - b[0], a[1] - b[1])
                angle = np.degrees(np.arctan2(a[1] - b[1], a[0] - b[0]))
                poly = cv2.ellipse2Poly((int(mx), int(my)),
                                        (int(length / 2), 4), int(angle), 0, 360, 1)
                cv2.fillConvexPoly(canvas, poly, [int(c * 0.6) for c in COLORS[k]])
            for part in range(18):
                if body[part, 2] >= 0.3:
                    cv2.circle(canvas, (int(body[part, 0]), int(body[part, 1])),
                               4, COLORS[part], thickness=-1)
        if include_hand:
            for hand in (person[92:113], person[113:134]):
                for ie, (e1, e2) in enumerate(HAND_EDGES):
                    a, b = hand[e1], hand[e2]
                    if a[2] < 0.3 or b[2] < 0.3:
                        continue
                    rgb = colorsys.hsv_to_rgb(ie / len(HAND_EDGES), 1.0, 1.0)
                    cv2.line(canvas, (int(a[0]), int(a[1])), (int(b[0]), int(b[1])),
                             tuple(int(c * 255) for c in rgb), 2)
                for x, y, s in hand:
                    if s >= 0.3:
                        cv2.circle(canvas, (int(x), int(y)), 4, (0, 0, 255), -1)
        if include_face:
            face = list(person[24:92])
            face += [person[14], person[15]]  # 68→70: pad with the eyes
            for x, y, s in face:
                if s >= 0.3:
                    cv2.circle(canvas, (int(x), int(y)), 3, (255, 255, 255), -1)
    return canvas


class DwposeDetector:
    def __init__(self, model_dir: str = "models/dwpose"):
        self.model_dir = model_dir
        self.det = None
        self.pose = None

    @property
    def available(self) -> bool:
        try:
            self.load()
            return self.det is not None and self.pose is not None
        except Exception:
            return False

    def load(self):
        if self.pose is not None or not os.path.isdir(self.model_dir):
            return
        import cv2

        det, pose = None, None
        for f in sorted(os.listdir(self.model_dir)):
            if not f.endswith(".onnx"):
                continue
            if "yolox" in f.lower() or "det" in f.lower():
                det = os.path.join(self.model_dir, f)
            else:
                pose = os.path.join(self.model_dir, f)
        if det and pose:
            self.det = cv2.dnn.readNetFromONNX(det)
            self.pose = cv2.dnn.readNetFromONNX(pose)

    def detect(self, img: np.ndarray, include_body=True, include_hand=True,
               include_face=True) -> np.ndarray:
        self.load()
        if self.pose is None:
            raise RuntimeError(f"no dwpose onnx pair under {self.model_dir}")
        boxes = detect_people(self.det, img)
        kps, scores = estimate_pose(self.pose, img, boxes)
        info = to_openpose_layout(kps, scores)
        canvas = np.zeros_like(img)
        return draw_pose(canvas, info, include_body, include_hand, include_face)


_DETECTOR: Optional[DwposeDetector] = None


def get_dwpose() -> DwposeDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = DwposeDetector()
    return _DETECTOR


def _dwpose(img, res, a, b):
    from .cv import resize_image

    out = get_dwpose().detect(resize_image(img, res))
    return np.asarray(out, np.float32) / 255.0


def _register():
    from . import Preprocessor, register

    register(Preprocessor("dw_openpose_full", _dwpose, tags=("OpenPose",),
                          needs_weights=True),
             aliases=("dwpose",))


_register()
