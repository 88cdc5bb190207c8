"""End-to-end aligned face restoration through Upscaler(use_face_enhancer=
True) with tiny synthetic checkpoints — the product path of the reference's
Upscaler (reference: modules/upscaler.py:53-74: GFPGANer(upscale=scale,
bg_upsampler=RealESRGAN).enhance(img, paste_back=True))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from controlanimate_tpu.models import face_align as fa
from controlanimate_tpu.models.gfpgan import FaceEnhancer, GFPGANv1Clean
from controlanimate_tpu.models.upscaler import Upscaler

cv2 = pytest.importorskip("cv2")

FACE_SIZE = 64
GFP_KW = dict(num_style_feat=32, narrow=0.25)


def _leaf_items(tree, prefix=""):
    for k in sorted(tree):
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(tree[k], dict):
            yield from _leaf_items(tree[k], p)
        else:
            yield p, tree[k]


@pytest.fixture(scope="module")
def gfpgan_ckpt(tmp_path_factory):
    """Tiny GFPGAN checkpoint built by inverting the flax tree's shapes back
    to the torch key layout (the test_gfpgan mapping-coverage construction)."""
    import math

    m = GFPGANv1Clean(out_size=FACE_SIZE, **GFP_KW)
    ref = jax.eval_shape(lambda: m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, FACE_SIZE, FACE_SIZE, 3))))["params"]
    rs = np.random.RandomState(0)
    log_size = int(math.log2(FACE_SIZE))

    def t_from_f(fpath: str) -> str:
        t = fpath.replace("/", ".")
        t = t.replace("stylegan_decoder.", "stylegan_decoder@")
        for i in range(log_size - 2):
            t = t.replace(f"conv_body_down_{i}.", f"conv_body_down.{i}.")
            t = t.replace(f"conv_body_up_{i}.", f"conv_body_up.{i}.")
            t = t.replace(f"condition_scale_{i}_0", f"condition_scale.{i}.0")
            t = t.replace(f"condition_scale_{i}_2", f"condition_scale.{i}.2")
            t = t.replace(f"condition_shift_{i}_0", f"condition_shift.{i}.0")
            t = t.replace(f"condition_shift_{i}_2", f"condition_shift.{i}.2")
        for i in range(2 * (log_size - 2)):
            t = t.replace(f"style_convs_{i}.", f"style_convs.{i}.")
        for i in range(log_size - 2):
            t = t.replace(f"to_rgbs_{i}.", f"to_rgbs.{i}.")
        return t.replace("@", ".")

    sd = {}
    for fpath, leaf in _leaf_items(ref):
        shape = tuple(leaf.shape)
        t = t_from_f(fpath)
        if t.endswith(".kernel"):
            base = t[: -len(".kernel")]
            if len(shape) == 4:  # (kh,kw,I,O) -> (O,I,kh,kw)
                sd[f"{base}.weight"] = (rs.randn(
                    shape[3], shape[2], shape[0], shape[1]) * 0.05).astype(np.float32)
            else:  # dense (I,O) -> (O,I)
                sd[f"{base}.weight"] = (rs.randn(shape[1], shape[0]) * 0.05).astype(np.float32)
        elif t.endswith(".bias"):
            sd[t] = (rs.randn(*shape) * 0.01).astype(np.float32)
        elif t.endswith("noise_weight"):
            sd[t.replace(".noise_weight", ".weight")] = np.asarray(0.0, np.float32)
        elif t.endswith("constant_input"):
            sd["stylegan_decoder.constant_input.weight"] = (rs.randn(
                1, shape[-1], shape[1], shape[2]) * 0.05).astype(np.float32)
        elif t.endswith(".weight") and len(shape) == 4:  # modulated (O,C,k,k)
            sd[t] = (rs.randn(1, *shape) * 0.05).astype(np.float32)
        else:
            sd[t] = (rs.randn(*shape) * 0.05).astype(np.float32)

    path = tmp_path_factory.mktemp("gfpgan") / "GFPGAN_tiny.pth"
    torch.save({"params_ema": {k: torch.tensor(v) for k, v in sd.items()}},
               str(path))
    return str(path)


@pytest.fixture(scope="module")
def rrdb_ckpt(tmp_path_factory):
    from tests.test_upscaler import _TorchRRDBNet, _randomize

    tm = _TorchRRDBNet(num_feat=64, num_block=1)
    _randomize(tm, seed=2)
    path = tmp_path_factory.mktemp("rrdb") / "RealESRGAN_tiny.pth"
    torch.save({"params_ema": tm.state_dict()}, str(path))
    return str(path)


def _frame_landmarks(h, w):
    """A face filling the middle of the frame (template shrunk into it)."""
    s = 0.4 * min(h, w) / 512.0
    M = np.array([[s, 0, w * 0.3], [0, s, h * 0.3]], np.float32)
    return fa.FFHQ_TEMPLATE_512 @ M[:, :2].T + M[:, 2]


def test_enhancer_haar_fallback_detector_kind(gfpgan_ckpt):
    fe = FaceEnhancer(gfpgan_ckpt, face_size=FACE_SIZE, model_kwargs=GFP_KW)
    assert fe.detector_kind in ("haar", "none")  # no RetinaFace weights here
    assert fe._retina is None


def test_enhance_no_faces_returns_background(gfpgan_ckpt, monkeypatch):
    fe = FaceEnhancer(gfpgan_ckpt, face_size=FACE_SIZE, model_kwargs=GFP_KW)
    monkeypatch.setattr(FaceEnhancer, "detect_landmarks",
                        lambda self, frame, **kw: [])
    frame = (np.random.RandomState(0).rand(48, 48, 3) * 255).astype(np.uint8)
    bg = (np.random.RandomState(1).rand(192, 192, 3) * 255).astype(np.uint8)
    out = fe.enhance(frame, background=bg, upscale=4.0)
    assert np.array_equal(out, bg)
    # GFPGANer with bg_upsampler=None: Lanczos background resize
    out2 = fe.enhance(frame, upscale=2.0)
    assert out2.shape == (96, 96, 3)


def test_enhance_pastes_restored_face(gfpgan_ckpt, monkeypatch):
    """The aligned path end to end: detect (stubbed) -> FFHQ warp ->
    restore -> scaled-inverse-affine paste. Face interior changes, frame
    corners stay the RealESRGAN background exactly."""
    fe = FaceEnhancer(gfpgan_ckpt, face_size=FACE_SIZE, model_kwargs=GFP_KW)
    h = w = 48
    lm = _frame_landmarks(h, w)
    monkeypatch.setattr(FaceEnhancer, "detect_landmarks",
                        lambda self, frame, **kw: [lm])
    frame = (np.random.RandomState(2).rand(h, w, 3) * 255).astype(np.uint8)
    bg = (np.random.RandomState(3).rand(4 * h, 4 * w, 3) * 255).astype(np.uint8)
    out = fe.enhance(frame, background=bg, upscale=4.0)
    assert out.shape == bg.shape and out.dtype == np.uint8
    center = (lm.mean(0) * 4).astype(int)
    y, x = center[1], center[0]
    assert not np.array_equal(out[y - 8:y + 8, x - 8:x + 8],
                              bg[y - 8:y + 8, x - 8:x + 8])
    assert np.array_equal(out[:6, :6], bg[:6, :6])
    assert np.array_equal(out[-6:, -6:], bg[-6:, -6:])


def test_upscaler_face_enhancer_e2e(gfpgan_ckpt, rrdb_ckpt, monkeypatch):
    """Upscaler(use_face_enhancer=True): RealESRGAN upscales the background,
    the restored face is pasted at scale (never re-degraded through the
    upscaler)."""
    up = Upscaler(
        scale=4.0, use_face_enhancer=True,
        model_path=rrdb_ckpt, face_enhancer_model_path=gfpgan_ckpt,
        face_enhancer_kwargs=dict(face_size=FACE_SIZE, model_kwargs=GFP_KW),
        num_block=1,
    )
    assert up.face_enhancer is not None
    h = w = 32
    frames = (np.random.RandomState(4).rand(2, h, w, 3) * 255).astype(np.uint8)

    # no faces detected -> identical to the pure upscale path
    monkeypatch.setattr(FaceEnhancer, "detect_landmarks",
                        lambda self, frame, **kw: [])
    out = up.process_batch(frames)
    ref = up.upscale_batch(frames)
    assert out.shape == (2, 4 * h, 4 * w, 3)
    assert np.array_equal(out, ref)

    # with a face: paste region differs from the pure upscale, corners match
    lm = _frame_landmarks(h, w)
    monkeypatch.setattr(FaceEnhancer, "detect_landmarks",
                        lambda self, frame, **kw: [lm])
    out = up.process_batch(frames)
    assert not np.array_equal(out, ref)
    assert np.array_equal(out[:, :6, :6], ref[:, :6, :6])


def test_upscaler_face_enhancer_missing_weights_degrades(rrdb_ckpt, tmp_path):
    """No GFPGAN checkpoint: the Upscaler silently degrades to upscale-only
    (the reference would download weights; zero-egress here)."""
    up = Upscaler(scale=4.0, use_face_enhancer=True, model_path=rrdb_ckpt,
                  face_enhancer_model_path=str(tmp_path / "missing.pth"),
                  num_block=1)
    assert up.face_enhancer is None
    frames = (np.random.RandomState(5).rand(1, 8, 8, 3) * 255).astype(np.uint8)
    assert up.process_batch(frames).shape == (1, 32, 32, 3)
