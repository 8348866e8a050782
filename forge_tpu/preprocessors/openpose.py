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


class OpenposeDetector:
    def __init__(self, model_dir: str = "models/openpose"):
        self.model_dir = model_dir
        self.params: Optional[Dict[str, Any]] = None
        self._jit = None

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
        self._jit = jax.jit(lambda t: body_apply(self.params, t))

    def detect(self, img: np.ndarray) -> np.ndarray:
        """uint8 [H,W,3] → pose map uint8 [H,W,3] (reference body.py __call__
        at scale 0.5·368/H, stride-8 upsample back)."""
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
        paf, heat = self._jit(x)
        paf = cv2.resize(np.asarray(paf[0], np.float32), (w, h),
                         interpolation=cv2.INTER_CUBIC)
        heat = cv2.resize(np.asarray(heat[0], np.float32), (w, h),
                          interpolation=cv2.INTER_CUBIC)
        peaks = find_peaks(heat)
        conns = match_limbs(paf, peaks, h)
        candidate, subset = assemble_people(peaks, conns)
        return draw_bodypose((h, w), candidate, subset)


_DETECTOR: Optional[OpenposeDetector] = None


def get_openpose() -> OpenposeDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = OpenposeDetector()
    return _DETECTOR


def _openpose(img, res, a, b):
    from .cv import resize_image

    det = get_openpose()
    out = det.detect(resize_image(img, res))
    return np.asarray(out, np.float32) / 255.0


def _register():
    from . import Preprocessor, register

    if get_openpose().available:
        register(Preprocessor("openpose", _openpose, tags=("OpenPose",)),
                 aliases=("openpose_full", "openpose (body)"))


_register()
