"""Auto focal-point crop (reference scripts/postprocessing_focal_crop.py →
modules/textual_inversion/autocrop.py): choose the crop window that covers
the image's most interesting region, scored by a weighted sum of face
detections, local entropy, and edge density.

Face detection uses OpenCV's cascade when its data files are present; this
image ships neither the cascade data nor the reference's downloadable DNN
(zero egress), so the face term degrades to 0 exactly like the reference
does when its model download fails.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _edge_map(gray: np.ndarray) -> np.ndarray:
    import cv2

    g = cv2.GaussianBlur(gray, (5, 5), 0)
    lap = np.abs(cv2.Laplacian(g, cv2.CV_32F))
    return lap / max(float(lap.max()), 1e-6)


def _entropy_map(gray: np.ndarray, block: int = 32) -> np.ndarray:
    h, w = gray.shape
    out = np.zeros((h, w), np.float32)
    for y in range(0, h, block):
        for x in range(0, w, block):
            tile = gray[y:y + block, x:x + block]
            hist, _ = np.histogram(tile, bins=32, range=(0, 255))
            p = hist / max(tile.size, 1)
            p = p[p > 0]
            out[y:y + block, x:x + block] = float(-(p * np.log2(p)).sum())
    return out / max(float(out.max()), 1e-6)


def _face_map(img: np.ndarray) -> Optional[np.ndarray]:
    try:
        import cv2

        path = cv2.data.haarcascades + "haarcascade_frontalface_default.xml"
        import os

        if not os.path.exists(path):
            return None
        cascade = cv2.CascadeClassifier(path)
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        faces = cascade.detectMultiScale(gray, 1.1, 4)
        if len(faces) == 0:
            return None
        out = np.zeros(img.shape[:2], np.float32)
        for (x, y, w, h) in faces:
            out[y:y + h, x:x + w] = 1.0
        return out
    except Exception:  # noqa: BLE001 — face term is best-effort
        return None


def focal_point(img: np.ndarray, face_weight: float = 0.9,
                entropy_weight: float = 0.15,
                edges_weight: float = 0.5) -> Tuple[int, int]:
    """→ (cx, cy) of the strongest weighted region."""
    import cv2

    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    score = edges_weight * _edge_map(gray) + entropy_weight * _entropy_map(gray)
    fm = _face_map(img)
    if fm is not None:
        score = score + face_weight * fm
    # blur so the argmax is a region's center, not a single hot pixel
    score = cv2.GaussianBlur(score, (0, 0), max(min(img.shape[:2]) / 16, 1))
    cy, cx = np.unravel_index(int(np.argmax(score)), score.shape)
    return int(cx), int(cy)


def focal_crop(img: np.ndarray, tw: int, th: int, face_weight: float = 0.9,
               entropy_weight: float = 0.15, edges_weight: float = 0.5
               ) -> np.ndarray:
    """Crop tw×th around the focal point (clamped to the image)."""
    h, w = img.shape[:2]
    tw, th = min(tw, w), min(th, h)
    cx, cy = focal_point(img, face_weight, entropy_weight, edges_weight)
    left = int(np.clip(cx - tw // 2, 0, w - tw))
    top = int(np.clip(cy - th // 2, 0, h - th))
    return img[top:top + th, left:left + tw]
