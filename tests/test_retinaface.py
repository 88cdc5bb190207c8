"""RetinaFace-ResNet50 detector: weight-mapping coverage (synthetic ckpt),
prior/decode/NMS unit goldens, and anchor-count consistency between the
network and the PriorBox — the detection half of the reference's GFPGAN
face pipeline (reference: modules/upscaler.py:53-61, facexlib
FaceRestoreHelper with retinaface_resnet50)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.models.retinaface import (
    MIN_SIZES,
    STEPS,
    RetinaFaceDetector,
    RetinaFaceNet,
    decode_boxes,
    decode_landmarks,
    nms,
    priors_for,
    retinaface_params_from_torch,
)


# --------------------------------------------------------------- synth ckpt
def synth_retinaface_sd(seed=0, scale=0.05):
    """torch-layout detection_Resnet50_Final state dict (random weights)."""
    rs = np.random.RandomState(seed)
    sd = {}

    def conv(t, o, i, k):
        sd[f"{t}.weight"] = (rs.randn(o, i, k, k) * scale).astype(np.float32)

    def bn(t, c):
        sd[f"{t}.weight"] = (1.0 + rs.randn(c) * 0.01).astype(np.float32)
        sd[f"{t}.bias"] = (rs.randn(c) * 0.01).astype(np.float32)
        sd[f"{t}.running_mean"] = (rs.randn(c) * 0.01).astype(np.float32)
        sd[f"{t}.running_var"] = (1.0 + rs.rand(c) * 0.1).astype(np.float32)

    def conv_bn(t_conv, t_bn, o, i, k):
        conv(t_conv, o, i, k)
        bn(t_bn, o)

    conv_bn("body.conv1", "body.bn1", 64, 3, 7)
    in_ch = 64
    for li, (mid, blocks) in enumerate(
            [(64, 3), (128, 4), (256, 6), (512, 3)], start=1):
        for bi in range(blocks):
            t = f"body.layer{li}.{bi}"
            conv_bn(f"{t}.conv1", f"{t}.bn1", mid, in_ch if bi == 0 else mid * 4, 1)
            conv_bn(f"{t}.conv2", f"{t}.bn2", mid, mid, 3)
            conv_bn(f"{t}.conv3", f"{t}.bn3", mid * 4, mid, 1)
            if bi == 0:
                conv_bn(f"{t}.downsample.0", f"{t}.downsample.1",
                        mid * 4, in_ch, 1)
                in_ch = mid * 4

    for name, i in (("output1", 512), ("output2", 1024), ("output3", 2048)):
        conv_bn(f"fpn.{name}.0", f"fpn.{name}.1", 256, i, 1)
    for name in ("merge1", "merge2"):
        conv_bn(f"fpn.{name}.0", f"fpn.{name}.1", 256, 256, 3)
    for i in (1, 2, 3):
        conv_bn(f"ssh{i}.conv3X3.0", f"ssh{i}.conv3X3.1", 128, 256, 3)
        conv_bn(f"ssh{i}.conv5X5_1.0", f"ssh{i}.conv5X5_1.1", 64, 256, 3)
        conv_bn(f"ssh{i}.conv5X5_2.0", f"ssh{i}.conv5X5_2.1", 64, 64, 3)
        conv_bn(f"ssh{i}.conv7X7_2.0", f"ssh{i}.conv7X7_2.1", 64, 64, 3)
        conv_bn(f"ssh{i}.conv7x7_3.0", f"ssh{i}.conv7x7_3.1", 64, 64, 3)
    for i in range(3):
        for head, o in (("ClassHead", 4), ("BboxHead", 8), ("LandmarkHead", 20)):
            conv(f"{head}.{i}.conv1x1", o, 256, 1)
            sd[f"{head}.{i}.conv1x1.bias"] = (rs.randn(o) * scale).astype(np.float32)
    return sd


def _leaf_items(tree, prefix=""):
    for k in sorted(tree):
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(tree[k], dict):
            yield from _leaf_items(tree[k], p)
        else:
            yield p, tree[k]


def test_weight_mapping_covers_tree():
    """The mapping must fill exactly the flax param tree (paths + shapes);
    checked against eval_shape so no actual resnet50 compute runs."""
    model = RetinaFaceNet()
    x = jnp.zeros((1, 64, 64, 3))
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x))["params"]
    params = retinaface_params_from_torch(synth_retinaface_sd())

    ref_paths = dict(_leaf_items(ref))
    got_paths = dict(_leaf_items(params))
    assert set(ref_paths) == set(got_paths), (
        f"missing: {sorted(set(ref_paths) - set(got_paths))[:6]} "
        f"extra: {sorted(set(got_paths) - set(ref_paths))[:6]}")
    for p, leaf in ref_paths.items():
        assert tuple(leaf.shape) == np.asarray(got_paths[p]).shape, (
            p, leaf.shape, np.asarray(got_paths[p]).shape)


def test_mapping_strips_module_prefix():
    sd = {f"module.{k}": v for k, v in synth_retinaface_sd().items()}
    params = retinaface_params_from_torch(sd)
    assert "body" in params and "class_head_0" in params


def test_bn_fold_is_exact():
    """Folded conv(x) == bn(conv(x)) on random data (torch eps 1e-5)."""
    import torch

    rs = np.random.RandomState(3)
    sd = synth_retinaface_sd(seed=3)
    w = torch.tensor(sd["body.conv1.weight"])
    bnt = torch.nn.BatchNorm2d(64, eps=1e-5).eval()
    with torch.no_grad():
        bnt.weight.copy_(torch.tensor(sd["body.bn1.weight"]))
        bnt.bias.copy_(torch.tensor(sd["body.bn1.bias"]))
        bnt.running_mean.copy_(torch.tensor(sd["body.bn1.running_mean"]))
        bnt.running_var.copy_(torch.tensor(sd["body.bn1.running_var"]))
    x = torch.tensor(rs.randn(1, 3, 16, 16).astype(np.float32))
    want = bnt(torch.nn.functional.conv2d(x, w, stride=2, padding=3))

    from controlanimate_tpu.models.retinaface import _fold_bn

    folded = _fold_bn(sd, "body.conv1", "body.bn1")
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(folded["kernel"]), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + folded["bias"]
    assert np.allclose(np.asarray(got),
                       want.detach().numpy().transpose(0, 2, 3, 1), atol=1e-4)


# ------------------------------------------------------------------ priors
@pytest.mark.parametrize("hw", [(64, 64), (96, 80), (100, 52)])
def test_anchor_count_matches_network(hw):
    H, W = hw
    model = RetinaFaceNet()
    box, cls, ldm = jax.eval_shape(
        lambda p, x: model.apply({"params": p}, x),
        jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3))))["params"],
        jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32),
    )
    A = len(priors_for(H, W))
    assert box.shape == (1, A, 4)
    assert cls.shape == (1, A, 2)
    assert ldm.shape == (1, A, 10)


def test_priors_layout():
    H = W = 64
    p = priors_for(H, W)
    expect = sum(math.ceil(H / s) * math.ceil(W / s) * len(m)
                 for s, m in zip(STEPS, MIN_SIZES))
    assert p.shape == (expect, 4)
    # first anchor: level step 8, cell (0,0), min_size 16
    assert np.allclose(p[0], [0.5 * 8 / W, 0.5 * 8 / H, 16 / W, 16 / H])
    # second: same cell, min_size 32
    assert np.allclose(p[1], [0.5 * 8 / W, 0.5 * 8 / H, 32 / W, 32 / H])
    # anchors normalized and centers in (0, 1)
    assert (p[:, :2] > 0).all() and (p[:, :2] < 1.0 + 1e-6).all()


def test_decode_zero_offsets():
    p = priors_for(64, 64)
    boxes = decode_boxes(np.zeros((len(p), 4), np.float32), p)
    assert np.allclose(boxes[:, :2], p[:, :2] - p[:, 2:] / 2, atol=1e-6)
    assert np.allclose(boxes[:, 2:], p[:, :2] + p[:, 2:] / 2, atol=1e-6)
    lm = decode_landmarks(np.zeros((len(p), 10), np.float32), p)
    assert np.allclose(lm, np.tile(p[:, :2], 5), atol=1e-6)


def test_decode_variances():
    """One prior, hand-computed SSD decode with variances (0.1, 0.2)."""
    p = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    loc = np.array([[1.0, -1.0, math.log(2.0) / 0.2, 0.0]], np.float32)
    out = decode_boxes(loc, p)
    cx, cy = 0.5 + 1.0 * 0.1 * 0.2, 0.5 - 1.0 * 0.1 * 0.2
    w, h = 0.4, 0.2
    assert np.allclose(out[0], [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                       atol=1e-6)


def test_nms_suppresses_overlaps():
    boxes = np.array([
        [10, 10, 60, 60],
        [12, 12, 62, 62],   # IoU ~0.85 with the first
        [200, 200, 260, 260],
    ], np.float32)
    scores = np.array([0.8, 0.95, 0.5], np.float32)
    keep = nms(boxes, scores, 0.4)
    assert keep == [1, 2]


# ------------------------------------------------------------------ facade
@pytest.mark.slow
def test_detector_facade_roundtrip(tmp_path):
    """Synthetic ckpt -> file -> RetinaFaceDetector -> detect_faces output
    contract ((n, 15), score-sorted, threshold honored)."""
    import torch

    path = tmp_path / "detection_Resnet50_Final.pth"
    torch.save({k: torch.tensor(v) for k, v in synth_retinaface_sd().items()},
               str(path))
    det = RetinaFaceDetector(str(path))
    frame = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    # an unsatisfiable threshold (softmax < 1) exercises the empty path
    out = det.detect_faces(frame, conf_threshold=1.1)
    assert out.shape == (0, 15)
    # a permissive threshold exercises decode + NMS end to end
    out = det.detect_faces(frame, conf_threshold=0.05, nms_threshold=0.4)
    assert out.ndim == 2 and out.shape[1] == 15
    if len(out) > 1:
        assert (np.diff(out[:, 4]) <= 1e-6).all()  # sorted by score desc


def test_detector_missing_weights_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        RetinaFaceDetector(str(tmp_path / "nope.pth"))
