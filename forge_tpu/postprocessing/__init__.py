"""Postprocessing stack: face restoration + interrogators.

The analog of the reference's side stacks (modules/gfpgan_model.py,
codeformer_model.py, interrogate.py, deepbooru.py) wired into the
processing pipeline's per-image post step and the /sdapi/v1 extras and
interrogate endpoints.
"""

from .faces import FaceRestorer, restore_faces_in_image  # noqa: F401
