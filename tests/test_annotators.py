"""New annotator nets vs the reference's own torch implementations on random
synthetic weights (the same golden-parity strategy as tests/test_golden_parity:
import the reference module, run both, compare).

Reference: extensions-builtin/forge_legacy_preprocessors/annotator/{lineart,
lineart_anime,pidinet}."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.state_dict import transform_for_jax
from forge_tpu.core.tree import nest

REF = "/root/reference/extensions-builtin/forge_legacy_preprocessors"
torch = pytest.importorskip("torch")


def _load_ref_module(relpath, name):
    """Import a reference annotator module with its webui deps stubbed."""
    if "modules" not in sys.modules or not hasattr(
            sys.modules.get("modules", None), "devices"):
        mod = types.ModuleType("modules")
        dev = types.ModuleType("modules.devices")
        dev.get_device_for = lambda *_a, **_k: torch.device("cpu")
        mod.devices = dev
        sys.modules["modules"] = mod
        sys.modules["modules.devices"] = dev
    ann = types.ModuleType("annotator")
    ann.__path__ = [os.path.join(REF, "annotator")]
    sys.modules.setdefault("annotator", ann)
    ap = types.ModuleType("annotator.annotator_path")
    ap.models_path = "/tmp/nonexistent_models"
    sys.modules["annotator.annotator_path"] = ap
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _to_jax(sd):
    return nest({k: jnp.asarray(v)
                 for k, v in transform_for_jax(
                     {k: v.numpy() for k, v in sd.items()}).items()})


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_lineart_generator_parity():
    from forge_tpu.preprocessors.lineart import lineart_apply

    ref = _load_ref_module("annotator/lineart/__init__.py", "ref_lineart")
    torch.manual_seed(0)
    net = ref.Generator(3, 1, 3)
    net.eval()
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        want = net(x).numpy()
    got = np.asarray(lineart_apply(_to_jax(net.state_dict()),
                                   jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    assert np.abs(want - got).max() < 1e-4, np.abs(want - got).max()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_lineart_anime_unet_parity():
    import functools

    from forge_tpu.preprocessors.lineart import lineart_anime_apply

    ref = _load_ref_module("annotator/lineart_anime/__init__.py", "ref_lineart_anime")
    torch.manual_seed(1)
    norm = functools.partial(torch.nn.InstanceNorm2d, affine=False,
                             track_running_stats=False)
    net = ref.UnetGenerator(3, 1, 8, 64, norm_layer=norm, use_dropout=False)
    net.eval()
    x = torch.rand(1, 3, 256, 256) * 2 - 1
    with torch.no_grad():
        want = net(x).numpy()
    got = np.asarray(lineart_anime_apply(_to_jax(net.state_dict()),
                                         jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    assert np.abs(want - got).max() < 2e-4, np.abs(want - got).max()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_pidinet_parity():
    from forge_tpu.preprocessors.pidinet import convert_pidinet_sd, pidinet_apply

    ref = _load_ref_module("annotator/pidinet/model.py", "ref_pidinet_model")
    torch.manual_seed(2)
    net = ref.PiDiNet(60, ref.config_model("carv4"), dil=24, sa=True)
    net.eval()
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        want = net(x)[-1].numpy()  # fused sigmoid map
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = nest({k: jnp.asarray(v)
                   for k, v in transform_for_jax(convert_pidinet_sd(sd)).items()})
    got = np.asarray(pidinet_apply(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    assert np.abs(want - got).max() < 1e-4, np.abs(want - got).max()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_mlsd_parity():
    from forge_tpu.preprocessors.mlsd import decode_lines, mlsd_apply

    sys.modules.setdefault("annotator.mlsd", types.ModuleType("annotator.mlsd"))
    sys.modules["annotator.mlsd"].__path__ = [os.path.join(REF, "annotator/mlsd")]
    models_pkg = types.ModuleType("annotator.mlsd.models")
    models_pkg.__path__ = [os.path.join(REF, "annotator/mlsd/models")]
    sys.modules["annotator.mlsd.models"] = models_pkg
    ref = _load_ref_module("annotator/mlsd/models/mbv2_mlsd_large.py",
                           "annotator.mlsd.models.mbv2_mlsd_large")
    torch.manual_seed(3)
    net = ref.MobileV2_MLSD_Large()
    net.eval()
    x = torch.rand(1, 4, 64, 64) * 2 - 1
    with torch.no_grad():
        want = net(x).numpy()
    got = np.asarray(mlsd_apply(_to_jax(net.state_dict()),
                                jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    assert want.shape == got.shape
    assert np.abs(want - got).max() < 1e-3, np.abs(want - got).max()

    # decode parity vs the reference's torch decoder
    ref_utils = _load_ref_module("annotator/mlsd/utils.py", "ref_mlsd_utils")
    tp_t = torch.from_numpy(
        np.random.default_rng(0).normal(size=(1, 9, 32, 32)).astype(np.float32))
    pts, scores, disp = ref_utils.deccode_output_score_and_ptss(tp_t, 50, 3)
    mine = decode_lines(tp_t.numpy()[0].transpose(1, 2, 0), topk=50,
                        score_thr=0.2, dist_thr=0.5)
    # reference builds segments from (pts, scores, disp) the same way
    want_segments = []
    start, end = disp[:, :, :2], disp[:, :, 2:]
    dist_map = np.sqrt(np.sum((start - end) ** 2, axis=-1))
    for (y, x_), s in zip(pts, scores):
        if s > 0.2 and dist_map[y, x_] > 0.5:
            dx0, dy0, dx1, dy1 = disp[y, x_]
            want_segments.append([x_ + dx0, y + dy0, x_ + dx1, y + dy1])
    want_segments = np.asarray(want_segments, np.float32).reshape(-1, 4)
    assert mine.shape == want_segments.shape
    if len(mine):
        # top-k order may differ for equal scores; compare as sets of rows
        a = np.sort(mine.round(4), axis=0)
        b = np.sort(want_segments.round(4), axis=0)
        assert np.allclose(a, b, atol=1e-3)


def test_depth_anything_synthetic():
    """DPT-on-DINOv2 graph runs on a synthetic vits-geometry checkpoint:
    widths/taps derived from the keys, output full-res, finite, ≥0."""
    from forge_tpu.preprocessors.depth_anything import depth_anything_apply

    r = np.random.default_rng(0)
    width, n_blocks, feat = 128, 12, 32
    oc = [feat, feat * 2, feat * 4, feat * 4]
    sd = {}

    def w(key, *shape, scale=0.05):
        sd[key] = (r.standard_normal(shape) * scale).astype(np.float32)

    def lin(key, o, i):
        w(key + ".weight", o, i)
        w(key + ".bias", o)

    sd["pretrained.cls_token"] = (r.standard_normal((1, 1, width)) * 0.02).astype(np.float32)
    sd["pretrained.pos_embed"] = (r.standard_normal((1, 1 + 16, width)) * 0.02).astype(np.float32)
    w("pretrained.patch_embed.proj.weight", width, 3, 14, 14)
    w("pretrained.patch_embed.proj.bias", width)
    for i in range(n_blocks):
        b = f"pretrained.blocks.{i}."
        lin(b + "attn.qkv", width * 3, width)
        lin(b + "attn.proj", width, width)
        lin(b + "mlp.fc1", width * 4, width)
        lin(b + "mlp.fc2", width, width * 4)
        sd[b + "norm1.weight"] = np.ones(width, np.float32)
        sd[b + "norm1.bias"] = np.zeros(width, np.float32)
        sd[b + "norm2.weight"] = np.ones(width, np.float32)
        sd[b + "norm2.bias"] = np.zeros(width, np.float32)
        sd[b + "ls1.gamma"] = np.full(width, 0.9, np.float32)
        sd[b + "ls2.gamma"] = np.full(width, 0.9, np.float32)
    h = "depth_head."
    for i in range(4):
        lin(h + f"projects.{i}", oc[i], width)
        sd[h + f"projects.{i}.weight"] = sd[h + f"projects.{i}.weight"].reshape(oc[i], width, 1, 1)
    w(h + "resize_layers.0.weight", oc[0], oc[0], 4, 4)  # ConvTranspose [I,O,k,k]
    w(h + "resize_layers.0.bias", oc[0])
    w(h + "resize_layers.1.weight", oc[1], oc[1], 2, 2)
    w(h + "resize_layers.1.bias", oc[1])
    w(h + "resize_layers.3.weight", oc[3], oc[3], 3, 3)
    w(h + "resize_layers.3.bias", oc[3])
    for i in range(4):
        w(h + f"scratch.layer{i + 1}_rn.weight", feat, oc[i], 3, 3)
        for cu in (1, 2):
            for cv in (1, 2):
                w(h + f"scratch.refinenet{i + 1}.resConfUnit{cu}.conv{cv}.weight",
                  feat, feat, 3, 3)
                w(h + f"scratch.refinenet{i + 1}.resConfUnit{cu}.conv{cv}.bias", feat)
        sd[h + f"scratch.refinenet{i + 1}.out_conv.weight"] = (
            r.standard_normal((feat, feat, 1, 1)) * 0.05).astype(np.float32)
        sd[h + f"scratch.refinenet{i + 1}.out_conv.bias"] = np.zeros(feat, np.float32)
    w(h + "scratch.output_conv1.weight", feat // 2, feat, 3, 3)
    w(h + "scratch.output_conv1.bias", feat // 2)
    w(h + "scratch.output_conv2.0.weight", 32, feat // 2, 3, 3)
    w(h + "scratch.output_conv2.0.bias", 32)
    w(h + "scratch.output_conv2.2.weight", 1, 32, 1, 1)
    w(h + "scratch.output_conv2.2.bias", 1)

    params = nest({k: jnp.asarray(v) for k, v in transform_for_jax(sd).items()})
    x = jnp.asarray(r.standard_normal((1, 56, 70, 3)).astype(np.float32))
    depth = np.asarray(depth_anything_apply(params, x))
    assert depth.shape == (1, 56, 70)
    assert np.isfinite(depth).all() and (depth >= 0).all()


def _load_openpose_ref(modname):
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.ToTensor = tvt.ToPILImage = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.measure")
        skm.label = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
        sk.measure = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = skm
    op_pkg = f"annotator.openpose"
    if op_pkg not in sys.modules:
        _load_ref_module("annotator/openpose/util.py", "annotator.openpose.util")
        pkg = types.ModuleType(op_pkg)
        pkg.__path__ = [os.path.join(REF, "annotator/openpose")]
        pkg.util = sys.modules["annotator.openpose.util"]
        sys.modules[op_pkg] = pkg
    return _load_ref_module(f"annotator/openpose/{modname}.py",
                            f"annotator.openpose.{modname}")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_openpose_hand_parity():
    from forge_tpu.preprocessors.openpose import hand_apply

    ref = _load_openpose_ref("model")
    torch.manual_seed(4)
    net = ref.handpose_model()
    net.eval()
    x = torch.rand(1, 3, 64, 64) - 0.5
    with torch.no_grad():
        want = net(x).numpy()
    got = np.asarray(hand_apply(_to_jax(net.state_dict()),
                                jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    assert want.shape == got.shape
    assert np.abs(want - got).max() < 1e-4, np.abs(want - got).max()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_openpose_face_parity():
    from forge_tpu.preprocessors.openpose import face_apply

    ref = _load_openpose_ref("face")
    torch.manual_seed(5)
    net = ref.FaceNet()
    net.eval()
    x = torch.rand(1, 3, 64, 64) - 0.5
    with torch.no_grad():
        want = net(x)[-1].numpy()
    got = np.asarray(face_apply(_to_jax(net.state_dict()),
                                jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    assert want.shape == got.shape
    assert np.abs(want - got).max() < 1e-4, np.abs(want - got).max()


def test_hand_face_box_geometry():
    """hand/face crop geometry matches the reference formulas on a synthetic
    body (util.py:230 handDetect, :324 faceDetect)."""
    from forge_tpu.preprocessors.openpose import face_box, hand_boxes

    kps = [None] * 18
    kps[0] = (100.0, 60.0)                      # nose
    kps[14], kps[15] = (92.0, 52.0), (108.0, 52.0)  # eyes
    kps[2], kps[3], kps[4] = (140.0, 100.0), (160.0, 140.0), (170.0, 180.0)
    boxes = hand_boxes(kps, 400, 400)
    assert len(boxes) == 1 and boxes[0][3] is False  # right hand only
    x, y, w, _ = boxes[0]
    # width = 1.5·max(|wrist−elbow|, 0.9·|elbow−shoulder|)
    want_w = 1.5 * max(np.hypot(10, 40), 0.9 * np.hypot(20, 40))
    assert abs(w - int(want_w)) <= 1
    fb = face_box(kps, 400, 400)
    assert fb is not None
    # width = 2 · max over eyes/ears of max(|dx|,|dy|)·mult = 2·8·3
    assert abs(fb[2] - 48) <= 1
