"""OpenPose body-pose preprocessor: CMU two-branch CPM in JAX + the
published PAF greedy-matching postprocessor.

Network: VGG-ish trunk (model0) then six refinement stages, each a PAF
branch (L1 → 38 maps) and a heatmap branch (L2 → 19 maps) over
cat(L1, L2, trunk) — reference
extensions-builtin/forge_legacy_preprocessors/annotator/openpose/model.py
bodypose_model; checkpoint keys `model0.conv1_1.weight` …
`model6_2.Mconv7_stage6_L2.bias` (body_pose_model.pth).

Postprocessing implements the published CMU OpenPose part-affinity-field
algorithm (reference annotator/openpose/body.py:23-207: peak NMS over
gaussian-smoothed heatmaps, line-integral PAF scoring, greedy bipartite
limb assembly, per-person subsets) — the algorithm is the spec; the
implementation here is an independent numpy rewrite.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

# limb sequence / PAF map pairs / draw colors: published CMU model constants
LIMB_SEQ = [[2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
            [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
            [1, 16], [16, 18], [3, 17], [6, 18]]
MAP_IDX = [[31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44],
           [19, 20], [21, 22], [23, 24], [25, 26], [27, 28], [29, 30],
           [47, 48], [49, 50], [53, 54], [51, 52], [55, 56], [37, 38],
           [45, 46]]
COLORS = [[255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
          [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85],
          [0, 255, 170], [0, 255, 255], [0, 170, 255], [0, 85, 255],
          [0, 0, 255], [85, 0, 255], [170, 0, 255], [255, 0, 255],
          [255, 0, 170], [255, 0, 85]]


def _seq(p: Mapping[str, Any], x: jax.Array, names: List[Tuple[str, int, bool]]):
    """Run an ordered conv/pool list: (name, pad, relu) or ('pool', 0, False)."""
    for name, pad, relu in names:
        if name == "pool":
            x = jax.lax.reduce_window(x, -np.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            continue
        x = nn.conv2d(x, p[name], padding=pad)
        if relu:
            x = jax.nn.relu(x)
    return x


def _trunk_plan():
    plan = []
    for name in ("conv1_1", "conv1_2"):
        plan.append((name, 1, True))
    plan.append(("pool", 0, False))
    for name in ("conv2_1", "conv2_2"):
        plan.append((name, 1, True))
    plan.append(("pool", 0, False))
    for name in ("conv3_1", "conv3_2", "conv3_3", "conv3_4"):
        plan.append((name, 1, True))
    plan.append(("pool", 0, False))
    for name in ("conv4_1", "conv4_2", "conv4_3_CPM", "conv4_4_CPM"):
        plan.append((name, 1, True))
    return plan


def _stage_plan(stage: int, branch: int):
    if stage == 1:
        names = [f"conv5_{i}_CPM_L{branch}" for i in range(1, 6)]
        pads = [1, 1, 1, 0, 0]
    else:
        names = [f"Mconv{i}_stage{stage}_L{branch}" for i in range(1, 8)]
        pads = [3, 3, 3, 3, 3, 0, 0]
    return [(n, p, i < len(names) - 1) for i, (n, p) in enumerate(zip(names, pads))]


def body_apply(params: Mapping[str, Any], x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x [B,H,W,3] (value/256 - 0.5) → (paf [B,h,w,38], heatmap [B,h,w,19])
    at stride 8."""
    trunk = _seq(params["model0"], x, _trunk_plan())
    l1 = _seq(params["model1_1"], trunk, _stage_plan(1, 1))
    l2 = _seq(params["model1_2"], trunk, _stage_plan(1, 2))
    for s in range(2, 7):
        cat = jnp.concatenate([l1, l2, trunk], axis=-1)
        l1 = _seq(params[f"model{s}_1"], cat, _stage_plan(s, 1))
        l2 = _seq(params[f"model{s}_2"], cat, _stage_plan(s, 2))
    return l1, l2


def hand_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """CPM hand net (reference annotator/openpose/model.py:143
    handpose_model): VGG trunk → 22-map stage, 5 refinement stages over
    cat(out, trunk). x [B,H,W,3] (value/256 − 0.5) → [B,H/8,W/8,22]."""
    plan = []
    for group, n in (("conv1", 2), ("conv2", 2), ("conv3", 4)):
        plan += [(f"{group}_{i}", 1, True) for i in range(1, n + 1)]
        plan.append(("pool", 0, False))
    plan += [(f"conv4_{i}", 1, True) for i in range(1, 5)]
    plan += [("conv5_1", 1, True), ("conv5_2", 1, True), ("conv5_3_CPM", 1, True)]
    trunk = _seq(params["model1_0"], x, plan)
    out = _seq(params["model1_1"], trunk,
               [("conv6_1_CPM", 0, True), ("conv6_2_CPM", 0, False)])
    for s in range(2, 7):
        cat = jnp.concatenate([out, trunk], axis=-1)
        names = [(f"Mconv{i}_stage{s}", 3, True) for i in range(1, 6)]
        names += [(f"Mconv6_stage{s}", 0, True), (f"Mconv7_stage{s}", 0, False)]
        out = _seq(params[f"model{s}"], cat, names)
    return out


def face_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """CPM face net (reference annotator/openpose/face.py:12 FaceNet):
    VGG trunk → 71-map stage, 5 refinement stages over cat(out, trunk).
    x [B,H,W,3] (value/256 − 0.5) → [B,H/8,W/8,71]."""
    plan = []
    for group, n in (("conv1", 2), ("conv2", 2), ("conv3", 4)):
        plan += [(f"{group}_{i}", 1, True) for i in range(1, n + 1)]
        plan.append(("pool", 0, False))
    plan += [(f"conv4_{i}", 1, True) for i in range(1, 5)]
    plan += [("conv5_1", 1, True), ("conv5_2", 1, True), ("conv5_3_CPM", 1, True)]
    trunk = _seq(params, x, plan)
    out = _seq(params, trunk, [("conv6_1_CPM", 0, True), ("conv6_2_CPM", 0, False)])
    for s in range(2, 7):
        h = jnp.concatenate([out, trunk], axis=-1)
        names = [(f"Mconv{i}_stage{s}", 3, True) for i in range(1, 6)]
        names += [(f"Mconv6_stage{s}", 0, True), (f"Mconv7_stage{s}", 0, False)]
        out = _seq(params, h, names)
    return out


# ---------------------------------------------------------------------------
# PAF postprocessing (numpy)


def find_peaks(heatmap: np.ndarray, thre1: float = 0.1):
    """Per-part peak lists [(x, y, score, id), ...] via 4-neighbor NMS on
    gaussian-smoothed maps."""
    from scipy.ndimage import gaussian_filter

    all_peaks = []
    counter = 0
    for part in range(18):
        m = heatmap[:, :, part]
        sm = gaussian_filter(m, sigma=3)
        left = np.zeros_like(sm); left[1:] = sm[:-1]
        right = np.zeros_like(sm); right[:-1] = sm[1:]
        up = np.zeros_like(sm); up[:, 1:] = sm[:, :-1]
        down = np.zeros_like(sm); down[:, :-1] = sm[:, 1:]
        keep = (sm >= left) & (sm >= right) & (sm >= up) & (sm >= down) & (sm > thre1)
        ys, xs = np.nonzero(keep)
        peaks = [(x, y, m[y, x], counter + i) for i, (x, y) in enumerate(zip(xs, ys))]
        all_peaks.append(peaks)
        counter += len(peaks)
    return all_peaks


def match_limbs(paf: np.ndarray, all_peaks, img_h: int, thre2: float = 0.05):
    """Greedy bipartite limb matching by PAF line integrals."""
    connections = []
    for k, (limb, midx) in enumerate(zip(LIMB_SEQ, MAP_IDX)):
        score_mid = paf[:, :, [m - 19 for m in midx]]
        cand_a = all_peaks[limb[0] - 1]
        cand_b = all_peaks[limb[1] - 1]
        if not cand_a or not cand_b:
            connections.append(np.zeros((0, 5)))
            continue
        cands = []
        for i, a in enumerate(cand_a):
            for j, b in enumerate(cand_b):
                vec = np.array([b[0] - a[0], b[1] - a[1]], np.float64)
                norm = max(np.linalg.norm(vec), 1e-3)
                vec = vec / norm
                xs = np.round(np.linspace(a[0], b[0], 10)).astype(int)
                ys = np.round(np.linspace(a[1], b[1], 10)).astype(int)
                mids = score_mid[ys, xs]  # [10, 2]
                scores = mids[:, 0] * vec[0] + mids[:, 1] * vec[1]
                prior = scores.mean() + min(0.5 * img_h / norm - 1, 0)
                if (scores > thre2).sum() > 0.8 * len(scores) and prior > 0:
                    cands.append((i, j, prior, prior + a[2] + b[2]))
        cands.sort(key=lambda c: -c[2])
        used_i, used_j = set(), set()
        rows = []
        for i, j, s, _ in cands:
            if i in used_i or j in used_j:
                continue
            rows.append([cand_a[i][3], cand_b[j][3], s, i, j])
            used_i.add(i); used_j.add(j)
            if len(rows) >= min(len(cand_a), len(cand_b)):
                break
        connections.append(np.asarray(rows, np.float64).reshape(-1, 5))
    return connections


def assemble_people(all_peaks, connections):
    """Merge limb connections into per-person part-index rows (subset),
    reference body.py:157-207."""
    candidate = np.array([p for peaks in all_peaks for p in peaks],
                         np.float64).reshape(-1, 4)
    subset = -1 * np.ones((0, 20))
    for k, conn in enumerate(connections):
        if len(conn) == 0:
            continue
        ia, ib = np.array(LIMB_SEQ[k]) - 1
        for row in conn:
            pa, pb, score = row[0], row[1], row[2]
            found = [j for j in range(len(subset))
                     if subset[j][ia] == pa or subset[j][ib] == pb]
            if len(found) == 1:
                j = found[0]
                if subset[j][ib] != pb:
                    subset[j][ib] = pb
                    subset[j][-1] += 1
                    subset[j][-2] += candidate[int(pb), 2] + score
            elif len(found) >= 2:
                j1, j2 = found[:2]
                member = ((subset[j1] >= 0).astype(int) + (subset[j2] >= 0).astype(int))[:-2]
                if not (member == 2).any():
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += score
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][ib] = pb
                    subset[j1][-1] += 1
                    subset[j1][-2] += candidate[int(pb), 2] + score
            elif k < 17:
                new = -1 * np.ones(20)
                new[ia], new[ib] = pa, pb
                new[-1] = 2
                new[-2] = candidate[int(pa), 2] + candidate[int(pb), 2] + score
                subset = np.vstack([subset, new])
    keep = [i for i in range(len(subset))
            if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4]
    return candidate, subset[keep]


def draw_bodypose(canvas_hw: Tuple[int, int], candidate: np.ndarray,
                  subset: np.ndarray) -> np.ndarray:
    """Render the skeleton map (reference annotator/openpose/util.py
    draw_bodypose: stickwidth-4 ellipses + radius-4 joints on black)."""
    import cv2

    h, w = canvas_hw
    canvas = np.zeros((h, w, 3), np.uint8)
    for k in range(17):
        ia, ib = np.array(LIMB_SEQ[k]) - 1
        for person in subset:
            idx_a, idx_b = int(person[ia]), int(person[ib])
            if idx_a < 0 or idx_b < 0:
                continue
            ax, ay = candidate[idx_a, :2]
            bx, by = candidate[idx_b, :2]
            mx, my = (ax + bx) / 2, (ay + by) / 2
            length = np.hypot(ax - bx, ay - by)
            angle = np.degrees(np.arctan2(ay - by, ax - bx))
            poly = cv2.ellipse2Poly((int(mx), int(my)), (int(length / 2), 4),
                                    int(angle), 0, 360, 1)
            cv2.fillConvexPoly(canvas, poly, [int(c * 0.6) for c in COLORS[k]])
    for part in range(18):
        for person in subset:
            idx = int(person[part])
            if idx < 0:
                continue
            x, y = candidate[idx, :2]
            cv2.circle(canvas, (int(x), int(y)), 4, COLORS[part], thickness=-1)
    return canvas


def person_keypoints(candidate: np.ndarray, subset: np.ndarray):
    """subset rows → per-person lists of 18 (x, y) tuples or None."""
    people = []
    for person in subset:
        kps = []
        for part in range(18):
            idx = int(person[part])
            kps.append(None if idx < 0 else (float(candidate[idx, 0]),
                                             float(candidate[idx, 1])))
        people.append(kps)
    return people


def hand_boxes(kps, img_h: int, img_w: int):
    """Hand square boxes from body keypoints (reference util.py:230
    handDetect: wrist extended by 0.33·(wrist−elbow), width 1.5·max(|we|,
    0.9·|es|), clamped, ≥20 px). → [(x, y, w, is_left), ...]"""
    out = []
    for sh_i, el_i, wr_i, is_left in ((5, 6, 7, True), (2, 3, 4, False)):
        if any(kps[i] is None for i in (sh_i, el_i, wr_i)):
            continue
        (x1, y1), (x2, y2), (x3, y3) = kps[sh_i], kps[el_i], kps[wr_i]
        x = x3 + 0.33 * (x3 - x2)
        y = y3 + 0.33 * (y3 - y2)
        width = 1.5 * max(np.hypot(x3 - x2, y3 - y2),
                          0.9 * np.hypot(x2 - x1, y2 - y1))
        x, y = max(x - width / 2, 0), max(y - width / 2, 0)
        width = min(width, img_w - x, img_h - y)
        if width >= 20:
            out.append((int(x), int(y), int(width), is_left))
    return out


def face_box(kps, img_h: int, img_w: int):
    """Face square box from nose/eyes/ears (reference util.py:324
    faceDetect). → (x, y, w) or None."""
    head = kps[0]
    feats = [kps[i] for i in (14, 15, 16, 17)]
    if head is None or all(f is None for f in feats):
        return None
    x0, y0 = head
    width = 0.0
    for f, mult in zip(feats, (3.0, 3.0, 1.5, 1.5)):
        if f is not None:
            width = max(width, max(abs(x0 - f[0]), abs(y0 - f[1])) * mult)
    x, y = max(x0 - width, 0), max(y0 - width, 0)
    width = min(width * 2, img_w - x, img_h - y)
    return (int(x), int(y), int(width)) if width >= 20 else None


def hand_peaks_from_heatmap(heat: np.ndarray, crop_h: int, crop_w: int,
                            thre: float = 0.05):
    """128² averaged hand heatmaps → 21 (x, y) peaks in crop coordinates
    (reference hand.py:64-83: gaussian σ3, largest connected component,
    argmax), (0,0) marking a miss."""
    from scipy.ndimage import gaussian_filter, label

    wsize = heat.shape[0]
    peaks = []
    for part in range(21):
        m = heat[:, :, part].copy()
        sm = gaussian_filter(m, sigma=3)
        binary = sm > thre
        if not binary.any():
            peaks.append((0, 0))
            continue
        lab, n = label(binary)
        sums = [m[lab == i].sum() for i in range(1, n + 1)]
        keep = int(np.argmax(sums)) + 1
        m[lab != keep] = 0
        y, x = np.unravel_index(np.argmax(m), m.shape)
        peaks.append((int(x * crop_w / wsize), int(y * crop_h / wsize)))
    return peaks


HAND_EDGES = [[0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6], [6, 7], [7, 8],
              [0, 9], [9, 10], [10, 11], [11, 12], [0, 13], [13, 14],
              [14, 15], [15, 16], [0, 17], [17, 18], [18, 19], [19, 20]]


def draw_handpose(canvas: np.ndarray, peaks, ox: int, oy: int) -> np.ndarray:
    """HSV-per-edge hand skeleton (reference util.py:142)."""
    import colorsys

    import cv2

    for ie, (a, b) in enumerate(HAND_EDGES):
        (xa, ya), (xb, yb) = peaks[a], peaks[b]
        if min(xa, ya, xb, yb) <= 0:
            continue
        rgb = colorsys.hsv_to_rgb(ie / len(HAND_EDGES), 1.0, 1.0)
        cv2.line(canvas, (ox + xa, oy + ya), (ox + xb, oy + yb),
                 tuple(int(c * 255) for c in rgb), 2)
    for x, y in peaks:
        if x > 0 and y > 0:
            cv2.circle(canvas, (ox + x, oy + y), 4, (0, 0, 255), thickness=-1)
    return canvas


def draw_facepose(canvas: np.ndarray, peaks, ox: int, oy: int) -> np.ndarray:
    """White landmark dots (reference util.py:193)."""
    import cv2

    for x, y in peaks:
        if x > 0 and y > 0:
            cv2.circle(canvas, (ox + x, oy + y), 3, (255, 255, 255), thickness=-1)
    return canvas


class OpenposeDetector:
    def __init__(self, model_dir: str = "models/openpose"):
        self.model_dir = model_dir
        self.params: Optional[Dict[str, Any]] = None
        self._jit = None
        self.hand_params: Optional[Dict[str, Any]] = None
        self._hand_jit = None
        self.face_params: Optional[Dict[str, Any]] = None
        self._face_jit = None

    @property
    def available(self) -> bool:
        try:
            self.load()
            return self.params is not None
        except Exception:
            return False

    def load(self):
        if self.params is not None:
            return
        if not os.path.isdir(self.model_dir):
            return
        cands = [f for f in sorted(os.listdir(self.model_dir))
                 if "body" in f and f.endswith((".pth", ".pt", ".safetensors"))]
        if not cands:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})
        self._jit = jax.jit(body_apply)

    def _load_extra(self, tag: str):
        """Load the hand/face CPM checkpoints lazily (hand_pose_model.pth,
        facenet.pth under the same model dir)."""
        attr = f"{tag}_params"
        if getattr(self, attr) is not None or not os.path.isdir(self.model_dir):
            return
        cands = [f for f in sorted(os.listdir(self.model_dir))
                 if tag in f.lower() and f.endswith((".pth", ".pt", ".safetensors"))]
        if not cands:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        setattr(self, attr, nest({k: jnp.asarray(v)
                                  for k, v in transform_for_jax(sd).items()}))
        if tag == "hand":
            self._hand_jit = jax.jit(hand_apply)
        else:
            self._face_jit = jax.jit(face_apply)

    @property
    def hand_available(self) -> bool:
        self._load_extra("hand")
        return self.hand_params is not None

    @property
    def face_available(self) -> bool:
        self._load_extra("face")
        return self.face_params is not None

    def _detect_hands(self, img: np.ndarray, kps, canvas: np.ndarray):
        """Crop per handDetect box, run the hand CPM at two fixed scales
        (184/368 — static shapes for XLA; the reference sweeps four dynamic
        scales, hand.py:26), average 128² heatmaps, draw."""
        import cv2

        h, w = img.shape[:2]
        for x0, y0, bw, _is_left in hand_boxes(kps, h, w):
            crop = img[y0:y0 + bw, x0:x0 + bw]
            heat = np.zeros((128, 128, 22), np.float32)
            scales = (184, 368)
            for s in scales:
                feed = cv2.resize(crop, (s, s), interpolation=cv2.INTER_CUBIC)
                out = self._hand_jit(self.hand_params,
                                     jnp.asarray(feed[None].astype(np.float32) / 256.0 - 0.5))
                hm = cv2.resize(np.asarray(out[0], np.float32), (128, 128),
                                interpolation=cv2.INTER_CUBIC)
                heat += hm / len(scales)
            peaks = hand_peaks_from_heatmap(heat, bw, bw)
            draw_handpose(canvas, peaks, x0, y0)

    def _detect_face(self, img: np.ndarray, kps, canvas: np.ndarray):
        """Crop per faceDetect box, run the face CPM at 384² (reference
        face.py:331), take per-part argmax over threshold, draw."""
        import cv2

        h, w = img.shape[:2]
        box = face_box(kps, h, w)
        if box is None:
            return
        x0, y0, bw = box
        crop = img[y0:y0 + bw, x0:x0 + bw]
        feed = cv2.resize(crop, (384, 384), interpolation=cv2.INTER_CUBIC)
        out = self._face_jit(self.face_params,
                             jnp.asarray(feed[None].astype(np.float32) / 256.0 - 0.5))
        heat = cv2.resize(np.asarray(out[0], np.float32), (bw, bw),
                          interpolation=cv2.INTER_CUBIC)
        peaks = []
        for part in range(70):
            m = heat[:, :, part]
            if (m > 0.05).any():
                y, x = np.unravel_index(np.argmax(np.where(m > 0.05, m, 0)), m.shape)
                peaks.append((int(x), int(y)))
        draw_facepose(canvas, peaks, x0, y0)

    def detect(self, img: np.ndarray, include_hand: bool = False,
               include_face: bool = False, include_body: bool = True) -> np.ndarray:
        """uint8 [H,W,3] → pose map uint8 [H,W,3] (reference body.py __call__
        at scale 0.5·368/H, stride-8 upsample back; openpose_full adds the
        hand + face CPMs on body-derived crops, __init__.py:415)."""
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no body_pose checkpoint under {self.model_dir}")
        h, w = img.shape[:2]
        scale = 0.5 * 368 / h
        sh, sw = int(round(h * scale)), int(round(w * scale))
        small = cv2.resize(img, (sw, sh), interpolation=cv2.INTER_LANCZOS4)
        ph, pw = (-sh) % 8, (-sw) % 8
        padded = np.pad(small, ((0, ph), (0, pw), (0, 0)), constant_values=128)
        x = jnp.asarray(padded[None].astype(np.float32) / 256.0 - 0.5)
        paf, heat = self._jit(self.params, x)
        paf = cv2.resize(np.asarray(paf[0], np.float32), (w, h),
                         interpolation=cv2.INTER_CUBIC)
        heat = cv2.resize(np.asarray(heat[0], np.float32), (w, h),
                          interpolation=cv2.INTER_CUBIC)
        peaks = find_peaks(heat)
        conns = match_limbs(paf, peaks, h)
        candidate, subset = assemble_people(peaks, conns)
        canvas = (draw_bodypose((h, w), candidate, subset) if include_body
                  else np.zeros((h, w, 3), np.uint8))
        if include_hand and self.hand_available:
            for kps in person_keypoints(candidate, subset):
                self._detect_hands(img, kps, canvas)
        if include_face and self.face_available:
            for kps in person_keypoints(candidate, subset):
                self._detect_face(img, kps, canvas)
        return canvas


_DETECTOR: Optional[OpenposeDetector] = None


def get_openpose() -> OpenposeDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = OpenposeDetector()
    return _DETECTOR


def _make_openpose(hand: bool, face: bool, body: bool = True):
    def call(img, res, a, b):
        from .cv import resize_image

        out = get_openpose().detect(resize_image(img, res), include_hand=hand,
                                    include_face=face, include_body=body)
        return np.asarray(out, np.float32) / 255.0

    return call


def _register():
    from . import Preprocessor, register

    register(Preprocessor("openpose", _make_openpose(False, False),
                          tags=("OpenPose",), needs_weights=True),
             aliases=("openpose (body)",))
    register(Preprocessor("openpose_hand", _make_openpose(True, False),
                          tags=("OpenPose",), needs_weights=True))
    register(Preprocessor("openpose_face", _make_openpose(False, True),
                          tags=("OpenPose",), needs_weights=True))
    register(Preprocessor("openpose_faceonly",
                          _make_openpose(False, True, body=False),
                          tags=("OpenPose",), needs_weights=True))
    register(Preprocessor("openpose_full", _make_openpose(True, True),
                          tags=("OpenPose",), needs_weights=True))


_register()
