"""Annotator tests: canny numerics, dispatch, HED/lineart net structure
(random weights; checkpoint-gated paths verified via synthetic state dicts)."""

import numpy as np
import pytest

from controlanimate_tpu.models.annotators import annotate_frames, resolve_annotator


def test_canny_matches_cv2():
    import cv2

    frames = (np.random.RandomState(0).rand(2, 32, 32, 3) * 255).astype(np.uint8)
    out = annotate_frames("lllyasviel/sd-controlnet-canny", frames)
    assert out.shape == (2, 32, 32, 3)
    expected = cv2.Canny(frames[0], 100, 200).astype(np.float32) / 255.0
    np.testing.assert_allclose(out[0, :, :, 0], expected)


def test_dispatch_substrings():
    assert resolve_annotator("lllyasviel/control_v11p_sd15_openpose")
    assert resolve_annotator("lllyasviel/control_v11p_sd15s2_lineart_anime")
    assert resolve_annotator("lllyasviel/control_v11p_sd15_softedge")
    with pytest.raises(KeyError):
        resolve_annotator("some/unknown_controlnet")


def _fake_hed_sd():
    rs = np.random.RandomState(0)
    sd = {"norm": rs.randn(1, 3, 1, 1).astype(np.float32)}
    blocks = {"block1": (3, 64, 2), "block2": (64, 128, 2), "block3": (128, 256, 3),
              "block4": (256, 512, 3), "block5": (512, 512, 3)}
    for name, (cin, cout, n) in blocks.items():
        c = cin
        for i in range(n):
            sd[f"{name}.convs.{i}.weight"] = rs.randn(cout, c, 3, 3).astype(np.float32) * 0.01
            sd[f"{name}.convs.{i}.bias"] = np.zeros(cout, np.float32)
            c = cout
        sd[f"{name}.projection.weight"] = rs.randn(1, cout, 1, 1).astype(np.float32) * 0.01
        sd[f"{name}.projection.bias"] = np.zeros(1, np.float32)
    return sd


def test_hed_forward_with_synthetic_weights(tmp_path, monkeypatch):
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in _fake_hed_sd().items()}, tmp_path / "ControlNetHED.pth")
    from controlanimate_tpu.models.annotators import edge_nets

    frames = (np.random.RandomState(1).rand(2, 64, 64, 3) * 255).astype(np.uint8)
    out = edge_nets.run("hed", frames, tmp_path)
    assert out.shape == (2, 64, 64, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def _fake_lineart_sd():
    rs = np.random.RandomState(1)

    def conv(cout, cin, k):
        return (rs.randn(cout, cin, k, k).astype(np.float32) * 0.02,
                np.zeros(cout, np.float32))

    sd = {}
    for prefix, (cout, cin, k) in {
        "model0.1": (64, 3, 7), "model1.0": (128, 64, 3), "model1.3": (256, 128, 3),
        "model4.1": (1, 64, 7),
    }.items():
        w, b = conv(cout, cin, k)
        sd[f"{prefix}.weight"], sd[f"{prefix}.bias"] = w, b
    for i in range(3):
        for j, layer in ((1, "conv1"), (5, "conv2")):
            w, b = conv(256, 256, 3)
            sd[f"model2.{i}.conv_block.{j}.weight"] = w
            sd[f"model2.{i}.conv_block.{j}.bias"] = b
    # ConvTranspose weights: (in, out, kh, kw)
    sd["model3.0.weight"] = rs.randn(256, 128, 3, 3).astype(np.float32) * 0.02
    sd["model3.0.bias"] = np.zeros(128, np.float32)
    sd["model3.3.weight"] = rs.randn(128, 64, 3, 3).astype(np.float32) * 0.02
    sd["model3.3.bias"] = np.zeros(64, np.float32)
    return sd


def test_lineart_forward_with_synthetic_weights(tmp_path):
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in _fake_lineart_sd().items()}, tmp_path / "sk_model.pth")
    from controlanimate_tpu.models.annotators import edge_nets

    frames = (np.random.RandomState(2).rand(1, 64, 64, 3) * 255).astype(np.uint8)
    out = edge_nets.run("lineart", frames, tmp_path)
    assert out.shape == (1, 64, 64, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_lineart_generator_matches_torch_convtranspose():
    """The up-path uses ConvTranspose2d(stride 2, pad 1, output_padding 1);
    verify the flax padding spec reproduces torch's geometry + numerics."""
    import torch
    import jax.numpy as jnp
    from flax import linen as nn
    from controlanimate_tpu.models.annotators.edge_nets import InstanceNorm  # noqa

    rs = np.random.RandomState(3)
    x = rs.randn(1, 8, 8, 4).astype(np.float32)
    w = rs.randn(4, 2, 3, 3).astype(np.float32)  # torch: (in, out, kh, kw)
    b = rs.randn(2).astype(np.float32)

    tout = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(w), torch.from_numpy(b),
        stride=2, padding=1, output_padding=1,
    ).numpy()

    conv = nn.ConvTranspose(2, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)), transpose_kernel=True)
    fout = conv.apply(
        {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(
        np.asarray(fout), np.transpose(tout, (0, 2, 3, 1)), atol=1e-4
    )


def test_lineart_anime_unet_generator(tmp_path):
    """UnetGenerator(3,1,8,64) port: synthetic torch ckpt -> forward."""
    import torch
    from controlanimate_tpu.models.annotators import lineart_anime as la

    rs = np.random.RandomState(0)
    sd = {}
    prefixes = la._torch_prefixes(8)
    ladder = la._ladder(64, 8)
    in_ch = 3
    for level, p in enumerate(prefixes):
        outer, inner = ladder[level]
        outermost = level == 0
        innermost = level == len(prefixes) - 1
        down_idx = 0 if outermost else 1
        up_idx = 3 if (outermost or innermost) else 5
        d_in = in_ch if outermost else ladder[level - 1][1]
        sd[f"{p}.{down_idx}.weight"] = rs.randn(inner, d_in, 4, 4).astype(np.float32) * 0.02
        sd[f"{p}.{down_idx}.bias"] = np.zeros(inner, np.float32)
        u_in = inner if innermost else inner * 2
        sd[f"{p}.{up_idx}.weight"] = rs.randn(u_in, outer, 4, 4).astype(np.float32) * 0.02
        sd[f"{p}.{up_idx}.bias"] = np.zeros(outer, np.float32)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, tmp_path / "netG.pth")

    frames = (np.random.RandomState(1).rand(1, 64, 64, 3) * 255).astype(np.uint8)
    out = la.run(frames, tmp_path)
    assert out.shape == (1, 64, 64, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_mlsd_hough_fallback(tmp_path):
    from controlanimate_tpu.models.annotators import mlsd

    # frame with a strong straight edge
    f = np.zeros((64, 64, 3), np.uint8)
    f[:, 32:] = 255
    out = mlsd.run(np.stack([f]), tmp_path)
    assert out.shape == (1, 64, 64, 3)
    assert out.max() == 1.0  # the vertical line was drawn


def _fake_openpose_sd():
    """Synthetic body_pose_model.pth with the exact torch key grammar."""
    from controlanimate_tpu.models.annotators.openpose import _BLOCK0

    rs = np.random.RandomState(0)
    sd = {}
    in_ch = 3
    for name, cin, cout, k in _BLOCK0:
        if name.startswith("pool"):
            continue
        sd[f"model0.{name}.weight"] = rs.randn(cout, in_ch, k, k).astype(np.float32) * 0.02
        sd[f"model0.{name}.bias"] = np.zeros(cout, np.float32)
        in_ch = cout
    for branch, out_ch in ((1, 38), (2, 19)):
        cin = 128
        for i in range(1, 4):
            sd[f"model1_{branch}.conv5_{i}_CPM_L{branch}.weight"] = rs.randn(128, cin, 3, 3).astype(np.float32) * 0.02
            sd[f"model1_{branch}.conv5_{i}_CPM_L{branch}.bias"] = np.zeros(128, np.float32)
            cin = 128
        sd[f"model1_{branch}.conv5_4_CPM_L{branch}.weight"] = rs.randn(512, 128, 1, 1).astype(np.float32) * 0.02
        sd[f"model1_{branch}.conv5_4_CPM_L{branch}.bias"] = np.zeros(512, np.float32)
        sd[f"model1_{branch}.conv5_5_CPM_L{branch}.weight"] = rs.randn(out_ch, 512, 1, 1).astype(np.float32) * 0.02
        sd[f"model1_{branch}.conv5_5_CPM_L{branch}.bias"] = np.zeros(out_ch, np.float32)
    for stage in range(2, 7):
        for branch, out_ch in ((1, 38), (2, 19)):
            cin = 185
            for i in range(1, 6):
                sd[f"model{stage}_{branch}.Mconv{i}_stage{stage}_L{branch}.weight"] = rs.randn(128, cin, 7, 7).astype(np.float32) * 0.01
                sd[f"model{stage}_{branch}.Mconv{i}_stage{stage}_L{branch}.bias"] = np.zeros(128, np.float32)
                cin = 128
            sd[f"model{stage}_{branch}.Mconv6_stage{stage}_L{branch}.weight"] = rs.randn(128, 128, 1, 1).astype(np.float32) * 0.01
            sd[f"model{stage}_{branch}.Mconv6_stage{stage}_L{branch}.bias"] = np.zeros(128, np.float32)
            sd[f"model{stage}_{branch}.Mconv7_stage{stage}_L{branch}.weight"] = rs.randn(out_ch, 128, 1, 1).astype(np.float32) * 0.01
            sd[f"model{stage}_{branch}.Mconv7_stage{stage}_L{branch}.bias"] = np.zeros(out_ch, np.float32)
    return sd


def test_openpose_forward_and_decode(tmp_path):
    import torch
    from controlanimate_tpu.models.annotators import openpose

    torch.save({k: torch.from_numpy(v) for k, v in _fake_openpose_sd().items()},
               tmp_path / "body_pose_model.pth")
    frames = (np.random.RandomState(1).rand(1, 96, 96, 3) * 255).astype(np.uint8)
    out = openpose.run(frames, tmp_path)
    assert out.shape == (1, 96, 96, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_normalbae_fallback():
    from controlanimate_tpu.models.annotators import normalbae

    frames = (np.random.RandomState(2).rand(2, 32, 32, 3) * 255).astype(np.uint8)
    out = normalbae.run(frames)
    assert out.shape == (2, 32, 32, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_pdc_difference_convs_vanish_on_constants():
    """Defining property of difference convolutions: cd/ad/rd respond with
    exactly zero to constant inputs (cv does not)."""
    import jax, jax.numpy as jnp
    from controlanimate_tpu.models.annotators.pidinet import PDCConv

    x = jnp.ones((1, 8, 8, 6)) * 0.37
    for kind, expect_zero in (("cd", True), ("ad", True), ("rd", True), ("cv", False)):
        m = PDCConv(kind, 6, depthwise=True)
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        y = np.asarray(m.apply({"params": p}, x))
        inner = y[:, 3:5, 3:5, :]  # away from padding
        if expect_zero:
            np.testing.assert_allclose(inner, 0.0, atol=1e-5, err_msg=kind)
        else:
            assert np.abs(inner).max() > 1e-3


def test_pidinet_forward_with_synthetic_weights(tmp_path):
    import torch
    import jax, jax.numpy as jnp
    from controlanimate_tpu.models.annotators import pidinet as pn

    # derive a synthetic torch sd from the flax tree shapes
    model = pn.PiDiNet()
    x = jnp.zeros((1, 64, 64, 3))
    ref = model.init(jax.random.PRNGKey(0), x)["params"]
    rs = np.random.RandomState(0)
    sd = {}

    def walk(tree, fpath=""):
        for k in sorted(tree):
            p = f"{fpath}/{k}" if fpath else k
            if isinstance(tree[k], dict):
                walk(tree[k], p)
            else:
                arr = np.asarray(tree[k])
                t = p.replace("/", ".")
                for i in range(4):
                    t = t.replace(f"dilations_{i}.", f"dilations.{i}.")
                    t = t.replace(f"attentions_{i}.", f"attentions.{i}.")
                    t = t.replace(f"conv_reduces_{i}.", f"conv_reduces.{i}.conv.")
                if t.endswith(".kernel"):
                    t = t[: -len(".kernel")] + ".weight"
                    sd[t] = rs.randn(*np.transpose(arr, (3, 2, 0, 1)).shape).astype(np.float32) * 0.05
                else:
                    sd[t] = rs.randn(*arr.shape).astype(np.float32) * 0.01

    walk(ref)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, tmp_path / "table5_pidinet.pth")

    frames = (np.random.RandomState(1).rand(1, 64, 64, 3) * 255).astype(np.uint8)
    out = pn.run(frames, tmp_path)
    assert out.shape == (1, 64, 64, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_mlsd_neural_with_synthetic_weights(tmp_path):
    """MLSD MobileNetV2+FPN port: synthetic BN-bearing ckpt -> forward+decode."""
    import torch
    from controlanimate_tpu.models.annotators import mlsd_net as mn

    rs = np.random.RandomState(0)
    sd = {}

    def conv_bn(conv_prefix, bn_prefix, cout, cin, k, groups=1):
        sd[f"{conv_prefix}.weight"] = rs.randn(cout, cin // groups, k, k).astype(np.float32) * 0.05
        sd[f"{bn_prefix}.weight"] = np.abs(rs.randn(cout)).astype(np.float32) + 0.5
        sd[f"{bn_prefix}.bias"] = rs.randn(cout).astype(np.float32) * 0.01
        sd[f"{bn_prefix}.running_mean"] = rs.randn(cout).astype(np.float32) * 0.01
        sd[f"{bn_prefix}.running_var"] = np.abs(rs.randn(cout)).astype(np.float32) + 1.0

    fx = "backbone.features"
    conv_bn(f"{fx}.0.0", f"{fx}.0.1", 32, 4, 3)
    in_c = 32
    for i, (e, c, s) in enumerate(mn._IR_SPEC, start=1):
        if e == 1:
            conv_bn(f"{fx}.{i}.conv.0.0", f"{fx}.{i}.conv.0.1", in_c, in_c, 3, groups=in_c)
            conv_bn(f"{fx}.{i}.conv.1", f"{fx}.{i}.conv.2", c, in_c, 1)
        else:
            hid = in_c * e
            conv_bn(f"{fx}.{i}.conv.0.0", f"{fx}.{i}.conv.0.1", hid, in_c, 1)
            conv_bn(f"{fx}.{i}.conv.1.0", f"{fx}.{i}.conv.1.1", hid, hid, 3, groups=hid)
            conv_bn(f"{fx}.{i}.conv.2", f"{fx}.{i}.conv.3", c, hid, 1)
        in_c = c
    # decoder: BlockA convs (in channels per tap), BlockB, BlockC
    for name, (c_a, c_b) in {"block15": (64, 96), "block17": (32, 128 and 64),
                             "block19": (24, 64), "block21": (16, 64)}.items():
        pass
    conv_bn("block15.conv1.0", "block15.conv1.1", 64, 96, 1)
    conv_bn("block15.conv2.0", "block15.conv2.1", 64, 64, 1)
    conv_bn("block16.conv1.0", "block16.conv1.1", 128, 128, 3)
    conv_bn("block16.conv2.0", "block16.conv2.1", 64, 128, 3)
    conv_bn("block17.conv1.0", "block17.conv1.1", 64, 64, 1)
    conv_bn("block17.conv2.0", "block17.conv2.1", 64, 32, 1)
    conv_bn("block18.conv1.0", "block18.conv1.1", 128, 128, 3)
    conv_bn("block18.conv2.0", "block18.conv2.1", 64, 128, 3)
    conv_bn("block19.conv1.0", "block19.conv1.1", 64, 64, 1)
    conv_bn("block19.conv2.0", "block19.conv2.1", 64, 24, 1)
    conv_bn("block20.conv1.0", "block20.conv1.1", 128, 128, 3)
    conv_bn("block20.conv2.0", "block20.conv2.1", 64, 128, 3)
    conv_bn("block21.conv1.0", "block21.conv1.1", 64, 64, 1)
    conv_bn("block21.conv2.0", "block21.conv2.1", 64, 16, 1)
    conv_bn("block22.conv1.0", "block22.conv1.1", 128, 128, 3)
    conv_bn("block22.conv2.0", "block22.conv2.1", 128, 128, 3)
    sd["block22.conv3.weight"] = rs.randn(16, 128, 1, 1).astype(np.float32) * 0.05
    sd["block22.conv3.bias"] = np.zeros(16, np.float32)

    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               tmp_path / "mlsd_large_512_fp32.pth")
    from controlanimate_tpu.models.annotators import mlsd

    frames = (np.random.RandomState(1).rand(1, 64, 64, 3) * 255).astype(np.uint8)
    out = mlsd.run(frames, tmp_path)
    assert out.shape == (1, 64, 64, 3)


def test_hand_net_forward_and_regions(tmp_path):
    import torch
    import jax, jax.numpy as jnp
    from controlanimate_tpu.models.annotators import openpose_hand_face as hf

    rs = np.random.RandomState(0)
    sd = {}
    in_ch = 3
    for name, ch, k in hf._HAND_TRUNK:
        if name.startswith("pool"):
            continue
        sd[f"model1_0.{name}.weight"] = rs.randn(ch, in_ch, k, k).astype(np.float32) * 0.02
        sd[f"model1_0.{name}.bias"] = np.zeros(ch, np.float32)
        in_ch = ch
    sd["model1_1.conv6_1_CPM.weight"] = rs.randn(512, 128, 1, 1).astype(np.float32) * 0.02
    sd["model1_1.conv6_1_CPM.bias"] = np.zeros(512, np.float32)
    sd["model1_1.conv6_2_CPM.weight"] = rs.randn(22, 512, 1, 1).astype(np.float32) * 0.02
    sd["model1_1.conv6_2_CPM.bias"] = np.zeros(22, np.float32)
    for stage in range(2, 7):
        cin = 150  # 22 + 128
        for i in range(1, 6):
            sd[f"model{stage}.Mconv{i}_stage{stage}.weight"] = rs.randn(128, cin, 7, 7).astype(np.float32) * 0.01
            sd[f"model{stage}.Mconv{i}_stage{stage}.bias"] = np.zeros(128, np.float32)
            cin = 128
        sd[f"model{stage}.Mconv6_stage{stage}.weight"] = rs.randn(128, 128, 1, 1).astype(np.float32) * 0.01
        sd[f"model{stage}.Mconv6_stage{stage}.bias"] = np.zeros(128, np.float32)
        sd[f"model{stage}.Mconv7_stage{stage}.weight"] = rs.randn(22, 128, 1, 1).astype(np.float32) * 0.01
        sd[f"model{stage}.Mconv7_stage{stage}.bias"] = np.zeros(22, np.float32)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, tmp_path / "hand_pose_model.pth")

    fn, params = hf.load_hand_net(tmp_path)
    x = jnp.zeros((1, 64, 64, 3))
    out = fn(params, x)
    assert out.shape == (1, 8, 8, 22)

    # region proposal geometry: a synthetic person with elbow+wrist
    candidate = np.array([[50, 50, 1, i] for i in range(8)], np.float64)
    subset = -1 * np.ones((1, 20))
    subset[0, 2], subset[0, 3], subset[0, 4] = 2, 3, 4  # right arm chain
    candidate[3][:2] = (40, 60)  # elbow
    candidate[4][:2] = (60, 80)  # wrist
    candidate[2][:2] = (30, 40)  # shoulder
    regions = hf.hand_regions_from_body(candidate, subset, 128, 128)
    assert len(regions) == 1
    x0, y0, w, is_left = regions[0]
    assert not is_left and w > 20


def test_face_net_forward_and_regions(tmp_path):
    import torch
    import jax, jax.numpy as jnp
    from controlanimate_tpu.models.annotators import openpose_face as of

    rs = np.random.RandomState(0)
    sd = {}
    in_ch = 3
    for name, ch, k in of._FACE_TRUNK:
        if name.startswith("pool"):
            continue
        sd[f"{name}.weight"] = rs.randn(ch, in_ch, k, k).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = np.zeros(ch, np.float32)
        in_ch = ch
    sd["conv6_1_CPM.weight"] = rs.randn(512, 128, 1, 1).astype(np.float32) * 0.02
    sd["conv6_1_CPM.bias"] = np.zeros(512, np.float32)
    sd["conv6_2_CPM.weight"] = rs.randn(71, 512, 1, 1).astype(np.float32) * 0.02
    sd["conv6_2_CPM.bias"] = np.zeros(71, np.float32)
    for stage in range(2, 7):
        cin = 199  # 71 + 128
        for i in range(1, 6):
            sd[f"Mconv{i}_stage{stage}.weight"] = rs.randn(128, cin, 7, 7).astype(np.float32) * 0.01
            sd[f"Mconv{i}_stage{stage}.bias"] = np.zeros(128, np.float32)
            cin = 128
        sd[f"Mconv6_stage{stage}.weight"] = rs.randn(128, 128, 1, 1).astype(np.float32) * 0.01
        sd[f"Mconv6_stage{stage}.bias"] = np.zeros(128, np.float32)
        sd[f"Mconv7_stage{stage}.weight"] = rs.randn(71, 128, 1, 1).astype(np.float32) * 0.01
        sd[f"Mconv7_stage{stage}.bias"] = np.zeros(71, np.float32)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, tmp_path / "facenet.pth")

    fn, params = of.load_face_net(tmp_path)
    out = fn(params, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 8, 8, 71)

    candidate = np.array([[64, 64, 1, 0], [0, 0, 0, 1]] + [[0, 0, 0, i] for i in range(2, 14)]
                         + [[70, 58, 1, 14], [58, 58, 1, 15], [80, 60, 1, 16], [48, 60, 1, 17]],
                         np.float64)
    subset = -1 * np.ones((1, 20))
    subset[0, 0] = 0
    subset[0, 14], subset[0, 15], subset[0, 16], subset[0, 17] = 14, 15, 16, 17
    regions = of.face_regions_from_body(candidate, subset, 128, 128)
    assert len(regions) == 1 and regions[0][2] > 20


@pytest.mark.slow
def test_dpt_hybrid_matches_transformers():
    """Flax DPT-hybrid (BiT backbone + hybrid neck) vs transformers
    DPTForDepthEstimation(is_hybrid=True) with identical tiny weights."""
    import torch
    import jax.numpy as jnp
    transformers = pytest.importorskip("transformers")
    from transformers import BitConfig, DPTConfig

    from controlanimate_tpu.models.annotators.dpt_hybrid import (
        dpt_hybrid_params_from_torch,
        model_from_config,
    )

    bit = BitConfig(
        embedding_size=8, hidden_sizes=[16, 24, 32], depths=[1, 1, 1],
        num_groups=4, layer_type="bottleneck", global_padding="SAME",
        out_features=["stage1", "stage2", "stage3"], embedding_dynamic_padding=True,
    )
    cfg = DPTConfig(
        is_hybrid=True, backbone_config=bit, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=64, image_size=64, patch_size=16,
        backbone_out_indices=[0, 1, 2, 3], neck_hidden_sizes=[16, 24, 32, 32],
        reassemble_factors=[1, 1, 1, 0.5], fusion_hidden_size=32,
        readout_type="project", backbone_featmap_shape=[1, 32, 4, 4],
        neck_ignore_stages=[0, 1],
    )
    torch.manual_seed(0)
    tm = transformers.DPTForDepthEstimation(cfg).eval()
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if name.endswith("bias"):
                p += 0.05  # push signal through the ReLU head
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    cfg_json = cfg.to_dict()
    model = model_from_config(cfg_json)
    params = dpt_hybrid_params_from_torch(sd, cfg_json)

    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        tout = tm(pixel_values=torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).predicted_depth.numpy()
    fout = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert fout.shape == tout.shape == (1, 64, 64)
    np.testing.assert_allclose(fout, tout, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_glpn_matches_transformers():
    """Flax GLPN (SegFormer encoder + selective-fusion decoder) vs
    transformers GLPNForDepthEstimation with identical tiny weights."""
    import torch
    import jax.numpy as jnp
    transformers = pytest.importorskip("transformers")

    from controlanimate_tpu.models.annotators.glpn import (
        GLPNCfg,
        GLPNDepth,
        glpn_params_from_torch,
    )

    cfg = transformers.GLPNConfig(
        hidden_sizes=[8, 16, 24, 32], depths=[1, 1, 1, 1], sr_ratios=[4, 2, 2, 1],
        num_attention_heads=[1, 2, 3, 4], patch_sizes=[7, 3, 3, 3],
        strides=[4, 2, 2, 2], mlp_ratios=[2, 2, 2, 2], decoder_hidden_size=16,
        max_depth=10, drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    tm = transformers.GLPNForDepthEstimation(cfg).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape) * 0.05)
                m.running_var.copy_(torch.rand(m.running_var.shape) * 0.5 + 0.75)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    jcfg = GLPNCfg.from_json(cfg.to_dict())
    model = GLPNDepth(jcfg)
    params = glpn_params_from_torch(sd, jcfg)

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))).predicted_depth.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_dpt_depth_matches_transformers():
    """Flax DPT port vs transformers DPTForDepthEstimation with identical
    (random, tiny, bias-shifted) weights."""
    import torch
    import jax.numpy as jnp
    transformers = pytest.importorskip("transformers")
    from controlanimate_tpu.models.annotators.dpt import DPTDepth, dpt_params_from_torch

    cfg = transformers.DPTConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=64, image_size=64, patch_size=8,
        backbone_out_indices=[0, 1, 2, 3],
        neck_hidden_sizes=[16, 16, 32, 32], fusion_hidden_size=32,
        readout_type="project", is_hybrid=False,
    )
    torch.manual_seed(0)
    tm = transformers.DPTForDepthEstimation(cfg).eval()
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if name.endswith("bias"):
                p += 0.05  # push signal through the ReLU head
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    model = DPTDepth(hidden_size=32, num_layers=4, heads=2, mlp_dim=64, patch=8,
                     taps=(0, 1, 2, 3), neck_hidden=(16, 16, 32, 32), fusion_hidden=32)
    params = dpt_params_from_torch(sd, 4, (0, 1, 2, 3))
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        tout = tm(pixel_values=torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).predicted_depth.numpy()
    fout = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(fout, tout, atol=5e-4, rtol=1e-3)
