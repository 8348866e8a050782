"""mediapipe_face annotator: face-mesh pseudo-segmentation maps.

The reference delegates entirely to Google's mediapipe binary package
(extensions-builtin/forge_legacy_preprocessors/annotator/mediapipe_face/
mediapipe_face_common.py: FaceMesh solution → drawing_utils annotation).
There is no model checkpoint to port — the net lives inside the mediapipe
wheel — so this registers the same preprocessor name and produces the same
annotation WHEN mediapipe is importable, and raises an actionable error
when it is not (this image does not bundle it; neither could the
reference run here).
"""

from __future__ import annotations

import numpy as np


def _mediapipe_face(img: np.ndarray, res: int, a: float, b: float) -> np.ndarray:
    try:
        import mediapipe  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "mediapipe_face needs the 'mediapipe' package (pip install "
            "mediapipe); it is not bundled in this environment") from e
    from .cv import resize_image

    small = resize_image(img, res)
    out = _generate_annotation(small, max_faces=max(int(a), 1),
                               min_confidence=b or 0.5)
    return np.asarray(out, np.float32) / 255.0


def _generate_annotation(img: np.ndarray, max_faces: int,
                         min_confidence: float) -> np.ndarray:
    """Reference mediapipe_face_common.generate_annotation behavior: run
    FaceMesh, draw the contour/tesselation annotation groups onto a black
    canvas at the detect resolution."""
    import mediapipe as mp

    face_mesh = mp.solutions.face_mesh
    drawing = mp.solutions.drawing_utils
    styles = mp.solutions.drawing_styles
    canvas = np.zeros_like(img)
    with face_mesh.FaceMesh(static_image_mode=True, max_num_faces=max_faces,
                            refine_landmarks=True,
                            min_detection_confidence=min_confidence) as mesh:
        results = mesh.process(img)
        for lms in (results.multi_face_landmarks or []):
            drawing.draw_landmarks(
                canvas, lms, face_mesh.FACEMESH_TESSELATION,
                landmark_drawing_spec=None,
                connection_drawing_spec=styles
                .get_default_face_mesh_tesselation_style())
            drawing.draw_landmarks(
                canvas, lms, face_mesh.FACEMESH_CONTOURS,
                landmark_drawing_spec=None,
                connection_drawing_spec=styles
                .get_default_face_mesh_contours_style())
    return canvas


def _register():
    from . import Preprocessor, register

    register(Preprocessor(
        "mediapipe_face", _mediapipe_face,
        slider_a=("Max Faces", 1, 10, 1),
        slider_b=("Min Confidence", 0.01, 1.0, 0.5),
        tags=("OpenPose",), needs_weights=True))


_register()
