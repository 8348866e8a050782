"""Face restoration: detect → crop/align → CodeFormer (JAX) → paste back.

Behavioral twin of the reference's face-restoration path
(modules/codeformer_model.py:47-55 restore + face_restoration_utils
CommonFaceRestoration.restore_with_helper): faces are cropped to 512²,
restored by the network on the TPU, and composited back with a feathered
seam.

Detection is host-side and pluggable (the reference hard-depends on
facexlib's RetinaFace CUDA stack): a YuNet ONNX (cv2.FaceDetectorYN) or a
Haar cascade XML placed under ``models/facedetection/`` is used when
present; otherwise the square center region is treated as one face so the
pipeline stays functional without binary assets.
"""

from __future__ import annotations

import functools
import glob
import os
from typing import Callable, List, Optional, Tuple

import numpy as np

Box = Tuple[int, int, int, int]  # x, y, w, h


def _load_detector(model_dir: str = "models/facedetection"):
    import cv2

    for onnx in sorted(glob.glob(os.path.join(model_dir, "*.onnx"))):
        try:
            det = cv2.FaceDetectorYN.create(onnx, "", (320, 320))
            return ("yunet", det)
        except Exception:
            continue
    for xml in sorted(glob.glob(os.path.join(model_dir, "*.xml"))):
        try:
            casc = cv2.CascadeClassifier(xml)
            if not casc.empty():
                return ("haar", casc)
        except Exception:
            continue
    return ("fullframe", None)


@functools.lru_cache(maxsize=1)
def _detector():
    return _load_detector()


def detect_faces(img: np.ndarray) -> List[Box]:
    """→ face boxes (x, y, w, h) in image coordinates."""
    import cv2

    kind, det = _detector()
    h, w = img.shape[:2]
    if kind == "yunet":
        det.setInputSize((w, h))
        _, faces = det.detect(img[..., ::-1].copy())  # BGR
        if faces is None:
            return []
        return [tuple(int(v) for v in f[:4]) for f in faces]
    if kind == "haar":
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        found = det.detectMultiScale(gray, 1.1, 4)
        return [tuple(int(v) for v in f) for f in found]
    side = min(h, w)
    return [((w - side) // 2, (h - side) // 2, side, side)]


def _square_expand(box: Box, img_h: int, img_w: int, expand: float = 1.6) -> Box:
    x, y, w, h = box
    cx, cy = x + w / 2, y + h / 2
    side = int(max(w, h) * expand)
    side = min(side, img_h, img_w)
    x0 = int(np.clip(cx - side / 2, 0, img_w - side))
    y0 = int(np.clip(cy - side / 2, 0, img_h - side))
    return (x0, y0, side, side)


def _feather_mask(size: int, border_frac: float = 0.08) -> np.ndarray:
    border = max(int(size * border_frac), 1)
    ramp = np.linspace(0.0, 1.0, border, dtype=np.float32)
    m = np.ones((size, size), np.float32)
    m[:border] *= ramp[:, None]
    m[-border:] *= ramp[::-1][:, None]
    m[:, :border] *= ramp[None, :]
    m[:, -border:] *= ramp[::-1][None, :]
    return m[..., None]


def restore_faces_in_image(img: np.ndarray,
                           restore_fn: Callable[[np.ndarray], np.ndarray],
                           face_size: int = 512) -> np.ndarray:
    """Run restore_fn (512² crop in, 512² crop out, uint8) on every detected
    face and paste back with a feathered seam."""
    import cv2

    out = img.astype(np.float32)
    h, w = img.shape[:2]
    for box in detect_faces(img):
        x, y, bw, bh = _square_expand(box, h, w)
        crop = img[y:y + bw, x:x + bw]
        scaled = cv2.resize(crop, (face_size, face_size), interpolation=cv2.INTER_LINEAR)
        restored = restore_fn(scaled)
        back = cv2.resize(np.asarray(restored, np.uint8), (bw, bw),
                          interpolation=cv2.INTER_LINEAR).astype(np.float32)
        mask = _feather_mask(bw)
        out[y:y + bw, x:x + bw] = back * mask + out[y:y + bw, x:x + bw] * (1 - mask)
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


class FaceRestorer:
    """CodeFormer-backed restorer (reference FaceRestorerCodeFormer).
    Weights from models/Codeformer/*.pth; jitted once per crop shape."""

    def __init__(self, model_dir: str = "models/Codeformer",
                 params=None):
        self.model_dir = model_dir
        self._params = params
        self._apply = None

    @property
    def available(self) -> bool:
        if self._params is not None:
            return True
        return bool(glob.glob(os.path.join(self.model_dir, "*.pth"))
                    or glob.glob(os.path.join(self.model_dir, "*.safetensors")))

    def _load(self):
        if self._params is None:
            from ..models.codeformer import load_codeformer

            paths = (glob.glob(os.path.join(self.model_dir, "*.pth"))
                     + glob.glob(os.path.join(self.model_dir, "*.safetensors")))
            if not paths:
                raise FileNotFoundError(
                    f"no CodeFormer checkpoint under {self.model_dir}")
            self._params = load_codeformer(sorted(paths)[0])
        if self._apply is None:
            import jax

            from ..models.codeformer import codeformer_apply

            # w gates the fuse-block structure (if w > 0), so it is static —
            # one compile per distinct weight, which users change rarely
            self._apply = jax.jit(codeformer_apply, static_argnames=("w", "adain"))
        return self._params, self._apply

    def restore(self, img: np.ndarray, w: Optional[float] = None) -> np.ndarray:
        """Full-image entry (reference codeformer_model.py:47 restore)."""
        if w is None:
            from ..runtime.options import opts

            try:
                w = float(opts.get("code_former_weight"))
            except KeyError:
                w = 0.5
        params, apply_fn = self._load()

        def restore_crop(crop: np.ndarray) -> np.ndarray:
            import jax.numpy as jnp

            x = jnp.asarray(crop, jnp.float32)[None] / 127.5 - 1.0
            y = apply_fn(params, x, w=float(w))
            return np.asarray(jnp.clip((y[0] + 1.0) * 127.5, 0, 255), np.float32)

        return restore_faces_in_image(img, restore_crop)


_restorer: Optional[FaceRestorer] = None


def get_face_restorer():
    """Dispatch by the face_restoration_model option (reference
    modules/face_restoration_utils + shared_options: CodeFormer | GFPGAN)."""
    from ..runtime.options import opts

    try:
        model = str(opts.get("face_restoration_model"))
    except KeyError:
        model = "CodeFormer"
    if model.lower() == "gfpgan":
        from .gfpgan import get_gfpgan

        return get_gfpgan()
    global _restorer
    if _restorer is None:
        _restorer = FaceRestorer()
    return _restorer
