"""New annotator nets vs the reference's own torch implementations on random
synthetic weights (the same golden-parity strategy as tests/test_golden_parity:
import the reference module, run both, compare).

Reference: extensions-builtin/forge_legacy_preprocessors/annotator/{lineart,
lineart_anime,pidinet}."""

import importlib.machinery
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


def _stub_module(name, **attrs):
    """Register a stub with a real __spec__ — a None __spec__ makes any later
    importlib.util.find_spec(name) raise (see tests/test_gguf.py note)."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _load_openpose_ref(modname):
    if "torchvision" not in sys.modules:
        tvt = _stub_module("torchvision.transforms", ToTensor=object, ToPILImage=object)
        _stub_module("torchvision", transforms=tvt)
    if "skimage" not in sys.modules:
        skm = _stub_module(
            "skimage.measure",
            label=lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub")))
        _stub_module("skimage", measure=skm)
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


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_teed_parity():
    from forge_tpu.preprocessors.teed import teed_apply

    _stub_module("annotator.util", load_model=lambda *a, **k: None,
                 safe_step=lambda x, s=2: x)
    teed_pkg = types.ModuleType("annotator.teed")
    teed_pkg.__path__ = [os.path.join(REF, "annotator/teed")]
    sys.modules["annotator.teed"] = teed_pkg
    for sub in ("Fsmish", "Xsmish"):
        _load_ref_module(f"annotator/teed/{sub}.py", f"annotator.teed.{sub}")
    ref = _load_ref_module("annotator/teed/ted.py", "annotator.teed.ted")
    torch.manual_seed(6)
    net = ref.TED()
    net.eval()
    x = torch.rand(1, 3, 64, 64) * 255.0
    with torch.no_grad():
        outs = net(x)
        stack = torch.stack([o[0, 0] for o in outs], dim=2).numpy()
        want = 1.0 / (1.0 + np.exp(-stack.mean(axis=2, dtype=np.float64)))
    got = np.asarray(teed_apply(_to_jax(net.state_dict()),
                                jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))[0]
    assert np.abs(want - got).max() < 1e-3, np.abs(want - got).max()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_manga_line_parity():
    from forge_tpu.preprocessors.manga_line import manga_line_apply

    ref = _load_ref_module("annotator/manga_line/__init__.py", "ref_manga_line")
    torch.manual_seed(7)
    net = ref.res_skip()
    net.eval()
    x = torch.rand(1, 1, 64, 64) * 255.0
    with torch.no_grad():
        want = net(x).numpy()
    got = np.asarray(manga_line_apply(_to_jax(net.state_dict()),
                                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    assert want.shape == got.shape
    assert np.abs(want - got).max() < 2e-2, np.abs(want - got).max()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_leres_parity():
    from forge_tpu.preprocessors.leres import leres_apply

    leres_pkg = types.ModuleType("annotator.leres")
    leres_pkg.__path__ = [os.path.join(REF, "annotator/leres")]
    sys.modules["annotator.leres"] = leres_pkg
    inner = types.ModuleType("annotator.leres.leres")
    inner.__path__ = [os.path.join(REF, "annotator/leres/leres")]
    sys.modules["annotator.leres.leres"] = inner
    for sub in ("Resnet", "Resnext_torch", "net_tools", "network_auxi"):
        _load_ref_module(f"annotator/leres/leres/{sub}.py",
                         f"annotator.leres.leres.{sub}")
        setattr(inner, sub, sys.modules[f"annotator.leres.leres.{sub}"])
    net_mod = sys.modules["annotator.leres.leres.network_auxi"]
    torch.manual_seed(8)

    class DepthModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_modules = net_mod.resnext101_stride32x8d()
            self.decoder_modules = net_mod.Decoder()

        def forward(self, x):
            return self.decoder_modules(self.encoder_modules(x))

    class Rel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.depth_model = DepthModel()

    net = Rel()
    net.eval()
    # randomize BN running stats so the test exercises them
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        want = net.depth_model(x).numpy()
    got = np.asarray(leres_apply(_to_jax(net.state_dict()),
                                 jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert want.shape[2:] == got.shape[1:3]
    assert np.abs(want[:, 0] - got).max() < 2e-3, np.abs(want[:, 0] - got).max()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_dwpose_decode_parity():
    """Numpy decode parity vs the reference's cv_ox_det/cv_ox_pose helpers
    (the ONNX nets themselves are external checkpoints, loaded identically
    via cv2.dnn)."""
    from forge_tpu.preprocessors import dwpose as dw

    det_ref = _load_ref_module("annotator/openpose/cv_ox_det.py", "ref_cv_ox_det")
    pose_ref = _load_ref_module("annotator/openpose/cv_ox_pose.py", "ref_cv_ox_pose")
    rng = np.random.default_rng(0)

    # YOLOX grid decode
    n_anchors = sum((640 // s) ** 2 for s in (8, 16, 32))
    raw = rng.normal(size=(n_anchors, 6)).astype(np.float32)
    want = det_ref.demo_postprocess(raw.copy()[None], (640, 640))[0]
    got = dw._yolox_decode(raw.copy())
    assert np.allclose(want, got, atol=1e-5)

    # NMS
    boxes = rng.uniform(0, 100, size=(40, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    scores = rng.uniform(size=40).astype(np.float32)
    assert dw._nms(boxes, scores, 0.45) == det_ref.nms(boxes, scores, 0.45)

    # top-down affine crop
    img = rng.integers(0, 255, size=(120, 160, 3)).astype(np.uint8)
    box = np.asarray([20.0, 10.0, 90.0, 110.0])
    want_imgs, want_c, want_s = pose_ref.preprocess(img, [box], (288, 384))
    crop, center, scale = dw._affine_crop(img, box)
    mean = np.array([123.675, 116.28, 103.53])
    std = np.array([58.395, 57.12, 57.375])
    assert np.allclose(want_c[0], center) and np.allclose(want_s[0], scale)
    assert np.allclose(want_imgs[0], (crop - mean) / std, atol=1e-3)

    # mmpose→openpose remap
    kps = rng.uniform(0, 100, size=(2, 133, 2)).astype(np.float32)
    scores = rng.uniform(size=(2, 133)).astype(np.float32)
    info = dw.to_openpose_layout(kps, scores)
    assert info.shape == (2, 134, 3)
    # neck = mean of shoulders (mmpose 5,6), mapped to openpose index 1
    assert np.allclose(info[:, 1, :2], kps[:, [5, 6]].mean(1))


def test_cv_preprocessor_registry():
    """Pure-CV annotators register and produce [h,w,3] float maps."""
    from forge_tpu.preprocessors import get_preprocessor

    img = np.random.default_rng(0).integers(0, 255, size=(80, 96, 3)).astype(np.uint8)
    for name in ("recolor_luminance", "recolor_intensity", "t2ia_color_grid",
                 "threshold_binary", "canny", "lineart_standard"):
        out = get_preprocessor(name)(img, res=64)
        assert out.ndim == 3 and out.shape[2] == 3, name
        assert out.dtype == np.float32 and out.min() >= 0 and out.max() <= 1.0, name


def test_anime_face_segment_synthetic():
    """Structural test on a synthetic torchvision-MobileNetV2-layout
    checkpoint (torchvision itself is not installed in this env, so the
    reference UNet cannot be instantiated for parity): full encoder/decoder
    wiring, softmax head, full-res output."""
    from forge_tpu.preprocessors.anime_face import _EN_BLOCKS, _STRIDES, anime_face_apply

    r = np.random.default_rng(0)
    sd = {}

    def conv(key, o, i, k=3, groups=1):
        sd[key + ".weight"] = (r.standard_normal((o, i // groups, k, k)) * 0.1).astype(np.float32)

    def bn(key, c):
        sd[key + ".weight"] = np.ones(c, np.float32)
        sd[key + ".bias"] = np.zeros(c, np.float32)
        sd[key + ".running_mean"] = np.zeros(c, np.float32)
        sd[key + ".running_var"] = np.ones(c, np.float32)

    # torchvision mobilenet_v2 channel plan for features[0..16]
    plan = {0: ("stem", 3, 32), 1: (1, 32, 16), 2: (6, 16, 24), 3: (6, 24, 24),
            4: (6, 24, 32), 5: (6, 32, 32), 6: (6, 32, 32), 7: (6, 32, 64),
            8: (6, 64, 64), 9: (6, 64, 64), 10: (6, 64, 64), 11: (6, 64, 96),
            12: (6, 96, 96), 13: (6, 96, 96), 14: (6, 96, 160),
            15: (6, 160, 160), 16: (6, 160, 160)}
    for blk, (lo, hi) in _EN_BLOCKS.items():
        for seq_i, feat_i in enumerate(range(lo, hi + 1)):
            base = f"en_block{blk}.{seq_i}"
            t, cin, cout = plan[feat_i]
            if t == "stem":
                conv(base + ".0", cout, cin)
                bn(base + ".1", cout)
                continue
            hidden = cin * t
            i = 0
            if t != 1:
                conv(base + ".conv.0.0", hidden, cin, k=1)
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{base}.conv.0.1.{suf}"] = (np.ones if suf in ("weight", "running_var")
                                                    else np.zeros)(hidden).astype(np.float32)
                i = 1
            conv(f"{base}.conv.{i}.0", hidden, hidden, k=3, groups=hidden)
            for suf in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{base}.conv.{i}.1.{suf}"] = (np.ones if suf in ("weight", "running_var")
                                                  else np.zeros)(hidden).astype(np.float32)
            conv(f"{base}.conv.{i + 1}", cout, hidden, k=1)
            for suf in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{base}.conv.{i + 2}.{suf}"] = (np.ones if suf in ("weight", "running_var")
                                                    else np.zeros)(cout).astype(np.float32)
    for name, (cin, cout) in (("de_block4", (160, 96)), ("de_block3", (192, 32)),
                              ("de_block2", (64, 24)), ("de_block1", (48, 16)),
                              ("de_block0", (32, 7))):
        conv(name + ".1", cout, cin)
        sd[name + ".1.bias"] = np.zeros(cout, np.float32)

    from forge_tpu.core.state_dict import transform_for_jax
    params = nest({k: jnp.asarray(v) for k, v in transform_for_jax(sd).items()})
    x = jnp.asarray(r.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    out = np.asarray(anime_face_apply(params, x))
    assert out.shape == (1, 64, 64, 7)
    assert np.allclose(out.sum(-1), 1.0, atol=1e-4)  # softmax head


def test_normalbae_synthetic():
    """Structural test of the NNET port on a tiny B5-shaped checkpoint
    (geffnet is not installed, so the reference encoder cannot be
    instantiated for parity): encoder block typing from keys, TF-SAME
    strides, UpSampleBN decoder, three pixel-MLP refinements, unit-normal
    + kappa head at full input resolution."""
    from forge_tpu.preprocessors.normalbae import normalbae_apply

    r = np.random.default_rng(0)
    sd = {}

    def conv(key, o, i, k=1, bias=True):
        sd[key + ".weight"] = (r.standard_normal((o, i, k, k)) * 0.1).astype(np.float32)
        if bias:
            sd[key + ".bias"] = np.zeros(o, np.float32)

    def bn(key, c):
        for suf, fill in (("weight", 1), ("bias", 0), ("running_mean", 0),
                          ("running_var", 1)):
            sd[f"{key}.{suf}"] = np.full(c, fill, np.float32)

    enc = "encoder.original_model"
    conv(enc + ".conv_stem", 8, 3, k=3, bias=False)
    bn(enc + ".bn1", 8)
    # 7 tiny stages: (cin, cout, k); stage 0 is depthwise-separable
    plan = [(8, 4, 3), (4, 6, 3), (6, 8, 5), (8, 12, 3), (12, 14, 5),
            (14, 16, 5), (16, 20, 3)]
    for b, (cin, cout, k) in enumerate(plan):
        base = f"{enc}.blocks.{b}.0"
        if b == 0:
            sd[base + ".conv_dw.weight"] = (r.standard_normal((cin, 1, k, k)) * 0.1).astype(np.float32)
            bn(base + ".bn1", cin)
            conv(base + ".se.conv_reduce", 2, cin)
            conv(base + ".se.conv_expand", cin, 2)
            conv(base + ".conv_pw", cout, cin, bias=False)
            bn(base + ".bn2", cout)
            continue
        hidden = cin * 2
        conv(base + ".conv_pw", hidden, cin, bias=False)
        bn(base + ".bn1", hidden)
        sd[base + ".conv_dw.weight"] = (r.standard_normal((hidden, 1, k, k)) * 0.1).astype(np.float32)
        bn(base + ".bn2", hidden)
        conv(base + ".se.conv_reduce", 2, hidden)
        conv(base + ".se.conv_expand", hidden, 2)
        conv(base + ".conv_pwl", cout, hidden, bias=False)
        bn(base + ".bn3", cout)
    conv(enc + ".conv_head", 32, 20, bias=False)
    bn(enc + ".bn2", 32)

    conv("decoder.conv2", 32, 32)
    for name, (cin, cout) in (("up1", (32 + 14, 24)), ("up2", (24 + 8, 16)),
                              ("up3", (16 + 6, 12)), ("up4", (12 + 4, 8))):
        conv(f"decoder.{name}._net.0", cout, cin, k=3)
        bn(f"decoder.{name}._net.1", cout)
        conv(f"decoder.{name}._net.3", cout, cout, k=3)
        bn(f"decoder.{name}._net.4", cout)
    conv("decoder.out_conv_res8", 4, 16, k=3)
    for name, cin in (("out_conv_res4", 16 + 4), ("out_conv_res2", 12 + 4),
                      ("out_conv_res1", 8 + 4)):
        dims = [cin, 10, 10, 10, 4]
        for j, i1 in enumerate(range(0, 7, 2)):
            sd[f"decoder.{name}.{i1}.weight"] = (
                r.standard_normal((dims[j + 1], dims[j], 1)) * 0.1).astype(np.float32)
            sd[f"decoder.{name}.{i1}.bias"] = np.zeros(dims[j + 1], np.float32)

    from forge_tpu.core.state_dict import transform_for_jax
    params = nest({k: jnp.asarray(v) for k, v in transform_for_jax(sd).items()})
    x = jnp.asarray(r.standard_normal((1, 64, 64, 3)).astype(np.float32))
    out = np.asarray(normalbae_apply(params, x))
    assert out.shape == (1, 64, 64, 4)
    norms = np.linalg.norm(out[..., :3], axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-4)       # unit normals
    assert out[..., 3].min() >= 0.01                # kappa floor


# ---------------------------------------------------------------------------
# UniFormer + UPerHead seg annotator


def _mod(name):
    """Stub module with a real ModuleSpec: a bare ModuleType leaves
    __spec__=None, which makes importlib.util.find_spec(name) raise for
    every *later* test that probes optional deps (transformers does
    find_spec("timm") when listing models)."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def _stub_uniformer_deps():
    """timm + mmseg/mmcv shims so the reference uniformer.py executes."""
    timm = _mod("timm")
    tml = _mod("timm.models")
    tly = _mod("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    tly.DropPath = DropPath
    tly.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    tly.trunc_normal_ = lambda t, std=0.02: torch.nn.init.trunc_normal_(t, std=std)
    timm.models = tml
    tml.layers = tly
    # stub ONLY when the real package is absent — overwriting just the
    # submodules of an installed timm would corrupt it for later tests
    if "timm" not in sys.modules and importlib.util.find_spec("timm") is None:
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tml
        sys.modules["timm.models.layers"] = tly

    mmseg_utils = _mod("mmseg.utils")
    mmseg_utils.get_root_logger = lambda *a, **k: None
    mmseg_builder = _mod("mmseg.models.builder")

    class _Registry:
        def register_module(self, *a, **k):
            return lambda cls: cls

    mmseg_builder.BACKBONES = _Registry()
    mmseg = _mod("mmseg")
    mmseg_models = _mod("mmseg.models")
    if "mmseg" not in sys.modules and importlib.util.find_spec("mmseg") is None:
        sys.modules["mmseg"] = mmseg
        sys.modules["mmseg.utils"] = mmseg_utils
        sys.modules["mmseg.models"] = mmseg_models
        sys.modules["mmseg.models.builder"] = mmseg_builder

    mmcv_custom = _mod("annotator.uniformer.mmcv_custom")
    mmcv_custom.load_checkpoint = lambda *a, **k: None
    pkg = _mod("annotator.uniformer")
    pkg.__path__ = [os.path.join(REF, "annotator/uniformer")]
    sys.modules.setdefault("annotator.uniformer", pkg)
    sys.modules["annotator.uniformer.mmcv_custom"] = mmcv_custom


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_uniformer_backbone_parity():
    from forge_tpu.preprocessors.uniformer import uniformer_features

    _stub_uniformer_deps()
    ref = _load_ref_module("annotator/uniformer/uniformer.py", "ref_uniformer")
    torch.manual_seed(3)
    net = ref.UniFormer(layers=[1, 1, 1, 1], embed_dim=[8, 16, 32, 64],
                        head_dim=16, drop_path_rate=0.0)
    net.eval()
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        want = [t.numpy() for t in net(x)]
    params = _to_jax(net.state_dict())
    got = uniformer_features(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                             head_dim=16)  # match the torch net's head split
    for w, g in zip(want, got):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        assert w.shape == g.shape
        # with head counts matched, only f32 rounding remains
        assert np.abs(w - g).max() < 1e-5, np.abs(w - g).max()


class _TorchUPerHead(torch.nn.Module):
    """Independent torch twin of mmseg UPerHead (uper_head.py, eval path)."""

    def __init__(self, in_channels=(8, 16, 32, 64), channels=16, num_classes=7,
                 pool_scales=(1, 2, 3, 6)):
        super().__init__()
        tnn = torch.nn

        def cm(cin, cout, k):
            return tnn.Sequential(
                tnn.Conv2d(cin, cout, k, padding=k // 2, bias=False),
                tnn.BatchNorm2d(cout), tnn.ReLU(inplace=True))

        self.pool_scales = pool_scales
        self.psp_modules = tnn.ModuleList(
            [tnn.Sequential(tnn.AdaptiveAvgPool2d(s),
                            cm(in_channels[-1], channels, 1))
             for s in pool_scales])
        self.bottleneck = cm(in_channels[-1] + len(pool_scales) * channels,
                             channels, 3)
        self.lateral_convs = tnn.ModuleList(
            [cm(c, channels, 1) for c in in_channels[:-1]])
        self.fpn_convs = tnn.ModuleList(
            [cm(channels, channels, 3) for _ in in_channels[:-1]])
        self.fpn_bottleneck = cm(len(in_channels) * channels, channels, 3)
        self.conv_seg = tnn.Conv2d(channels, num_classes, 1)

    def forward(self, feats):
        import torch.nn.functional as F

        def up(t, size):
            return F.interpolate(t, size=size, mode="bilinear",
                                 align_corners=False)

        top = feats[-1]
        psp = [top] + [up(m(top), top.shape[2:]) for m in self.psp_modules]
        lats = [m(feats[i]) for i, m in enumerate(self.lateral_convs)]
        lats.append(self.bottleneck(torch.cat(psp, 1)))
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + up(lats[i], lats[i - 1].shape[2:])
        fpn = [m(lats[i]) for i, m in enumerate(self.fpn_convs)] + [lats[-1]]
        fpn = [up(f, fpn[0].shape[2:]) for f in fpn]
        return self.conv_seg(self.fpn_bottleneck(torch.cat(fpn, 1)))


def test_upernet_head_parity():
    from forge_tpu.preprocessors.uniformer import upernet_apply

    torch.manual_seed(4)
    net = _TorchUPerHead()
    net.eval()
    # remap Sequential indices to the mmseg key layout the JAX side expects
    # (ConvModule stores .conv/.bn; psp_modules.N.1 is the ConvModule)
    sd = {}
    for k, v in net.state_dict().items():
        k = (k.replace(".0.weight", ".conv.weight")
             .replace(".1.weight", ".bn.weight").replace(".1.bias", ".bn.bias")
             .replace(".1.running_mean", ".bn.running_mean")
             .replace(".1.running_var", ".bn.running_var")
             .replace(".1.num_batches_tracked", ".bn.num_batches_tracked"))
        if k.startswith("psp_modules."):
            # psp_modules.N.1.<conv|bn>... : keep the ".1" Sequential level
            parts = k.split(".")
            k = ".".join(parts[:2] + ["1"] + parts[2:]) \
                if parts[2] in ("conv", "bn") else k
        sd[k] = v.numpy()
    sd = {k: v for k, v in sd.items() if "num_batches_tracked" not in k}
    params = nest({k: jnp.asarray(v) for k, v in transform_for_jax(sd).items()})

    r = np.random.default_rng(5)
    feats_np = [r.standard_normal((1, s, s, c)).astype(np.float32)
                for s, c in ((16, 8), (8, 16), (4, 32), (2, 64))]
    with torch.no_grad():
        want = net([torch.from_numpy(f.transpose(0, 3, 1, 2))
                    for f in feats_np]).numpy()
    got = np.asarray(upernet_apply(params, [jnp.asarray(f) for f in feats_np]))
    got = got.transpose(0, 3, 1, 2)
    assert want.shape == got.shape
    assert np.abs(want - got).max() < 1e-4, np.abs(want - got).max()
