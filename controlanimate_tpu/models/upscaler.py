"""RealESRGAN (RRDBNet) upscaler in Flax + Upscaler facade.

Capability parity with the reference post-processing
(reference: modules/upscaler.py: RealESRGAN_x4plus_anime_6B RRDBNet with 6
blocks, netscale 4, optional GFPGAN face enhancement, scale clamp 1<s<8).
The reference runs torch/CUDA per frame; here the RRDB network is a jitted
Flax model batched over frames.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.upsample import upsample2x_conv3x3
from ..weights import ingest


def lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


# --------------------------------------------------------------------------
# space-to-depth body: 512^2 x 64ch tensors are TPU-hostile (C=64/32 pads to
# the 128-lane tile in HBM and on the MXU); running the body at
# 256^2 x 256ch makes every channel dim lane-exact. A 3x3 stride-1 conv in
# fine space is EXACTLY a 3x3 conv in s2d space with a phase-structured
# kernel (4x nominal MACs, absorbed by the otherwise-idle MXU).
# --------------------------------------------------------------------------

def _s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel order (py, px, c)."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def _d2s(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _s2d."""
    B, h, w, C4 = x.shape
    C = C4 // 4
    return x.reshape(B, h, w, 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, 2 * h, 2 * w, C)


def _s2d_selector() -> np.ndarray:
    """Constant S[dy,dx,py,px,qy,qx,u,v]=1 iff fine tap (u-1,v-1) of output
    phase (qy,qx) reads coarse neighbor (dy-1,dx-1) at input phase (py,px):
    u-1 = 2(dy-1)+py-qy (and likewise for v). Zero-padding in coarse space
    reproduces the fine conv's 1px zero pad exactly (the pad row's unused
    phase has zero kernel weight)."""
    S = np.zeros((3, 3, 2, 2, 2, 2, 3, 3), np.float32)
    for dy in range(3):
        for dx in range(3):
            for py in range(2):
                for px in range(2):
                    for qy in range(2):
                        for qx in range(2):
                            u = 2 * (dy - 1) + py - qy
                            v = 2 * (dx - 1) + px - qx
                            if -1 <= u <= 1 and -1 <= v <= 1:
                                S[dy, dx, py, px, qy, qx, u + 1, v + 1] = 1.0
    return S


_S2D_SEL = _s2d_selector()


def _s2d_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) fine conv kernel -> (3,3,4Ci,4Co) s2d-space kernel."""
    ci, co = k.shape[2], k.shape[3]
    kp = jnp.einsum("dDpPqQuv,uvio->dDpPiqQo", jnp.asarray(_S2D_SEL, k.dtype), k)
    return kp.reshape(3, 3, 4 * ci, 4 * co)


def _s2d_bias(b: jnp.ndarray) -> jnp.ndarray:
    """(Co,) -> (4Co,) matching the (qy,qx,co) channel order."""
    return jnp.tile(b, 4)


class _ConvParams(nn.Module):
    """3x3 conv kernel/bias with the same param tree as nn.Conv (so the
    folded-upsample path can consume the raw kernel)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class ResidualDenseBlock(nn.Module):
    """Dense block in kernel-split sum form.

    The torch layout computes conv(concat([x, c1, ..]), K); concatenation
    is TPU-hostile — a profiler trace of the (1,512,512,3) program showed
    the concat materialization (copies + dynamic-update-slices + pads) and
    the resulting UNFUSED leaky_relu passes cost ~75 of 122 ms/frame while
    the convs themselves cost ~30 (perf/uptrace_r4.log). Splitting each
    kernel along its input channels turns every conv(concat(...)) into a
    sum of convs over the ORIGINAL tensors — identical MACs and (up to
    float reassociation) identical output, no concat buffers, and each
    activation fuses into a conv epilogue. `form="concat"` keeps the
    literal torch dataflow for A/B and golden tests."""

    growth: int = 32
    dtype: jnp.dtype = jnp.float32
    form: str = "sum"

    @nn.compact
    def __call__(self, x):
        feats = x.shape[-1]
        g = self.growth
        if self.form == "concat":
            c1 = lrelu(nn.Conv(g, (3, 3), padding=1, name="conv1", dtype=self.dtype)(x))
            c2 = lrelu(nn.Conv(g, (3, 3), padding=1, name="conv2", dtype=self.dtype)(
                jnp.concatenate([x, c1], -1)))
            c3 = lrelu(nn.Conv(g, (3, 3), padding=1, name="conv3", dtype=self.dtype)(
                jnp.concatenate([x, c1, c2], -1)))
            c4 = lrelu(nn.Conv(g, (3, 3), padding=1, name="conv4", dtype=self.dtype)(
                jnp.concatenate([x, c1, c2, c3], -1)))
            c5 = nn.Conv(feats, (3, 3), padding=1, name="conv5", dtype=self.dtype)(
                jnp.concatenate([x, c1, c2, c3, c4], -1))
            return x + 0.2 * c5

        dt = self.dtype

        def cv(t, k):
            return jax.lax.conv_general_dilated(
                t.astype(dt), k.astype(dt), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if self.form == "s2d":
            # input arrives space-to-depth'd: (B, H/2, W/2, 4*feats)
            feats = feats // 4

        # same param tree as the concat form (conv1..conv5: kernel/bias)
        k1, b1 = _ConvParams(feats, g, name="conv1")()
        k2, b2 = _ConvParams(feats + g, g, name="conv2")()
        k3, b3 = _ConvParams(feats + 2 * g, g, name="conv3")()
        k4, b4 = _ConvParams(feats + 3 * g, g, name="conv4")()
        k5, b5 = _ConvParams(feats + 4 * g, feats, name="conv5")()

        def split(k):
            # input-channel slices: [x (feats), c1 (g), c2 (g), ...]
            cuts = [feats + i * g for i in range(5)]
            return [k[:, :, a:b] for a, b in zip([0] + cuts, cuts + [None])
                    if a < k.shape[2]]

        s2, s3, s4, s5 = split(k2), split(k3), split(k4), split(k5)
        if self.form == "s2d":
            # per-source kernel slices transform independently (the s2d map
            # is linear and channel-blockwise); biases tile over out-phases
            k1, s2, s3, s4, s5 = (
                _s2d_kernel(k1),
                [_s2d_kernel(k) for k in s2], [_s2d_kernel(k) for k in s3],
                [_s2d_kernel(k) for k in s4], [_s2d_kernel(k) for k in s5],
            )
            b1, b2, b3, b4, b5 = (_s2d_bias(b) for b in (b1, b2, b3, b4, b5))
        c1 = lrelu(cv(x, k1) + b1.astype(dt))
        c2 = lrelu(cv(x, s2[0]) + cv(c1, s2[1]) + b2.astype(dt))
        c3 = lrelu(cv(x, s3[0]) + cv(c1, s3[1]) + cv(c2, s3[2]) + b3.astype(dt))
        c4 = lrelu(cv(x, s4[0]) + cv(c1, s4[1]) + cv(c2, s4[2])
                   + cv(c3, s4[3]) + b4.astype(dt))
        c5 = (cv(x, s5[0]) + cv(c1, s5[1]) + cv(c2, s5[2]) + cv(c3, s5[3])
              + cv(c4, s5[4]) + b5.astype(dt))
        return x + 0.2 * c5


class RRDB(nn.Module):
    dtype: jnp.dtype = jnp.float32
    form: str = "sum"

    @nn.compact
    def __call__(self, x):
        h = ResidualDenseBlock(name="rdb1", dtype=self.dtype, form=self.form)(x)
        h = ResidualDenseBlock(name="rdb2", dtype=self.dtype, form=self.form)(h)
        h = ResidualDenseBlock(name="rdb3", dtype=self.dtype, form=self.form)(h)
        return x + 0.2 * h


class RRDBNet(nn.Module):
    num_feat: int = 64
    num_block: int = 6  # anime_6B variant
    scale: int = 4
    dtype: jnp.dtype = jnp.float32
    form: str = "sum"  # RDB dataflow: "sum" (TPU) | "concat" (torch-literal)

    @nn.compact
    def __call__(self, x, mode: str = "full"):
        """x: (B, H, W, 3) in [0,1] -> (B, H*scale, W*scale, 3).

        mode: "full" — the whole net as ONE XLA program (golden/CPU path);
        "body" — conv_first + RRDB trunk + residual, returns the (B,H,W,nf)
        feature map; "tail" — x IS that feature map, runs the up-stage with
        the Pallas im2col kernels (ops/upconv_kernel.py). body/tail exist so
        the Upscaler can put the Pallas tail in its OWN jitted program: XLA
        lowers the 64-channel >=1024^2 conv family ~10x off roofline
        (perf/upchunk_r4.json) and the Pallas forms win every standalone
        shootout, but mixing the custom-calls into the same program as the
        RRDB body poisoned layout assignment for the UNCHANGED body fusions
        (0.82 -> 4.44 ms each, perf/upconv_r5.json) — a program boundary is
        the clean fix."""
        assert mode in ("full", "body", "tail"), mode
        if mode == "tail":
            return self._tail(x)
        feat = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv_first", dtype=self.dtype)(x)
        if self.form == "s2d" and feat.shape[1] % 2 == 0 and feat.shape[2] % 2 == 0:
            # whole body at (H/2, W/2, 4*feat): lane-exact channels
            fs = _s2d(feat)
            body = fs
            for i in range(self.num_block):
                body = RRDB(name=f"body_{i}", dtype=self.dtype, form="s2d")(body)
            kb, bb = _ConvParams(self.num_feat, self.num_feat, name="conv_body")()
            body = jax.lax.conv_general_dilated(
                body.astype(self.dtype), _s2d_kernel(kb).astype(self.dtype),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + _s2d_bias(bb).astype(self.dtype)
            feat = _d2s(fs + body)
        else:
            form = "sum" if self.form == "s2d" else self.form  # odd H/W guard
            body = feat
            for i in range(self.num_block):
                body = RRDB(name=f"body_{i}", dtype=self.dtype, form=form)(body)
            body = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv_body", dtype=self.dtype)(body)
            feat = feat + body
        if mode == "body":
            return feat
        # nearest-2x + conv3x3 folded into one parity-decomposed conv
        # (ops/upsample.py): exact, 4/9 the MACs on the two largest
        # activations of the network (the up convs run at 2x/4x input res)
        k1, b1 = _ConvParams(self.num_feat, self.num_feat, name="conv_up1")()
        k2, b2 = _ConvParams(self.num_feat, self.num_feat, name="conv_up2")()
        kh, bh = _ConvParams(self.num_feat, self.num_feat, name="conv_hr")()
        feat = lrelu(upsample2x_conv3x3(feat, k1, b1, dtype=self.dtype))
        if self.scale == 4:
            feat = lrelu(upsample2x_conv3x3(feat, k2, b2, dtype=self.dtype))
        else:
            feat = lrelu(jax.lax.conv_general_dilated(
                feat.astype(self.dtype), k2.astype(self.dtype), (1, 1),
                ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b2.astype(self.dtype))
        feat = lrelu(jax.lax.conv_general_dilated(
            feat.astype(self.dtype), kh.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bh.astype(self.dtype))
        return nn.Conv(3, (3, 3), padding=1, name="conv_last", dtype=self.dtype)(feat)

    def _tail(self, feat):
        """Pallas up-stage: (B, H, W, nf) body features -> (B, 4H, 4W, 3).
        Exact vs the XLA tail up to f32-accumulation reassociation (same
        parity fold); interpret mode on CPU so tests drive the real
        composition. Requires scale == 4 (the only shipped RRDB variant,
        reference modules/upscaler.py:25)."""
        assert self.scale == 4, "pallas tail is the x4 up-stage"
        from ..ops.upconv_kernel import conv3x3_small, upsample2x_conv3x3_fine

        import os as _os

        interp = jax.default_backend() == "cpu"
        via = _os.environ.get("CONTROLANIMATE_UPK_EMIT", "rows")
        dt = self.dtype
        k1, b1 = _ConvParams(self.num_feat, self.num_feat, name="conv_up1")()
        k2, b2 = _ConvParams(self.num_feat, self.num_feat, name="conv_up2")()
        kh, bh = _ConvParams(self.num_feat, self.num_feat, name="conv_hr")()
        feat = upsample2x_conv3x3_fine(
            feat.astype(dt), k1.astype(dt), b1, act="lrelu", interpret=interp,
            via=via)
        feat = upsample2x_conv3x3_fine(
            feat, k2.astype(dt), b2, act="lrelu", interpret=interp, via=via)
        feat = conv3x3_small(feat, kh.astype(dt), bh, act="lrelu",
                             interpret=interp)
        return nn.Conv(3, (3, 3), padding=1, name="conv_last", dtype=self.dtype)(feat)


def rrdbnet_params_from_torch(sd: dict[str, np.ndarray], num_block: int = 6) -> dict:
    """basicsr RRDBNet state dict -> flax params."""
    if "params_ema" in sd or any(k.startswith("params_ema.") for k in sd):
        sd = {k[len("params_ema."):]: v for k, v in sd.items() if k.startswith("params_ema.")} or sd
    elif any(k.startswith("params.") for k in sd):
        sd = {k[len("params."):]: v for k, v in sd.items() if k.startswith("params.")}

    def conv(t):
        return {"kernel": ingest.conv_kernel(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}

    params: dict = {
        "conv_first": conv("conv_first"),
        "conv_body": conv("conv_body"),
        "conv_up1": conv("conv_up1"),
        "conv_up2": conv("conv_up2"),
        "conv_hr": conv("conv_hr"),
        "conv_last": conv("conv_last"),
    }
    for i in range(num_block):
        blk = {}
        for r in (1, 2, 3):
            rdb = {}
            for c in range(1, 6):
                rdb[f"conv{c}"] = conv(f"body.{i}.rdb{r}.conv{c}")
            blk[f"rdb{r}"] = rdb
        params[f"body_{i}"] = blk
    return params


class Upscaler:
    """Per-frame upscale facade (reference: modules/upscaler.py:17-74)."""

    def __init__(
        self,
        scale: float,
        use_face_enhancer: bool = False,
        upscale_first: bool = False,
        model_path: Optional[str] = None,
        face_enhancer_model_path: Optional[str] = None,
        face_detector_model_path: Optional[str] = None,
        face_enhancer_kwargs: Optional[dict] = None,
        num_block: int = 6,
        dtype: jnp.dtype = jnp.float32,
    ):
        if not (1 < scale < 8):
            raise ValueError("upscale must be within (1, 8) (reference: upscaler.py:64)")
        self.scale = float(scale)
        self.upscale_first = upscale_first
        self.use_face_enhancer = use_face_enhancer
        path = Path(model_path or "models/Upscalers/RealESRGAN_x4plus_anime_6B.pth")
        if not path.exists():
            raise FileNotFoundError(f"RealESRGAN weights not found at {path}")
        # `dtype` is the COMPUTE dtype (params stay f32, cast at use — the
        # flax policy the UNet follows). The reference runs its RealESRGANer
        # with half=True (modules/upscaler.py:50); the orchestrator passes
        # the run dtype so bf16 runs upscale in bf16 too.
        import os

        # s2d measured 105.0 ms/frame at (1,512,512,3) bf16 vs sum 143.7 /
        # concat 148.7 in one session (perf/rdbform_r4.json)
        form = os.environ.get("CONTROLANIMATE_RRDB_FORM", "s2d")
        self.model = RRDBNet(num_block=num_block, dtype=dtype, form=form)
        self.params = jax.device_put(rrdbnet_params_from_torch(ingest.load_state_dict(path), num_block))
        self._jit = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)
        )
        # Pallas up-stage (ops/upconv_kernel.py) as a SEPARATE jitted
        # program from the body — same-program mixing poisoned the body's
        # layouts (perf/upconv_r5.json). "1" (default): split on TPU;
        # "0": single XLA program; "force": split even on CPU (interpret
        # kernels — tests only).
        self._up_kernel_env = os.environ.get("CONTROLANIMATE_UP_KERNEL", "1")
        self.face_enhancer = None
        if use_face_enhancer:
            try:
                from .gfpgan import FaceEnhancer

                self.face_enhancer = FaceEnhancer(
                    face_enhancer_model_path,
                    detector_path=face_detector_model_path,
                    **(face_enhancer_kwargs or {}),
                )
            except FileNotFoundError:
                self.face_enhancer = None  # no GFPGAN weights: upscale only

    def _hbm_chunk(self, n: int, h: int, w: int) -> int:
        """Frames per RRDB dispatch. Two constraints, measured on v5e:

        - HBM: the network's 4x-res 64-channel activations dominate — TWO
          live copies each padded ~2x by the TPU layout (an unchunked
          16-frame 512px batch allocates 2 x 16GB and OOMs a 15.75GB chip).
        - Dispatch rate: at large geometry, SMALLER chunks are FASTER
          (perf/upchunk_r4.json: 512->2048 per-frame 147.5 ms at chunk=1 vs
          165.3 at chunk=2 in bf16; 140.8 vs 165.3 in f32 — batching buys
          nothing once a single frame is far above the ~25ms dispatch floor,
          and the bigger live set adds allocator pressure).

        So: per-frame dispatch once one output frame alone is dispatch-floor
        dominant (>= 1024^2 output pixels); below that, the largest divisor
        of n whose HBM peak stays under ~8GB (divisor so every chunk shares
        one compiled program shape)."""
        if (4 * h) * (4 * w) >= 1024 * 1024:
            return 1
        act = (4 * h) * (4 * w) * 64 * jnp.dtype(self.model.dtype).itemsize
        per_frame = 4 * act  # 2 live copies x ~2x layout padding
        cap = max(1, int(8e9 // per_frame))
        return max((d for d in range(1, n + 1) if n % d == 0 and d <= cap), default=1)

    def _split_ok(self, h: int, w: int) -> bool:
        """Use the two-program Pallas tail? (x4 net only; even H/W keeps the
        kernels' row/col tiling on power-of-two blocks)."""
        return (self.model.scale == 4 and h % 2 == 0 and w % 2 == 0
                and (self._up_kernel_env == "force"
                     or (self._up_kernel_env == "1"
                         and jax.default_backend() != "cpu")))

    def _ensure_split_jits(self):
        if hasattr(self, "_jit_body"):
            return
        self._jit_body = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x, mode="body"))
        self._jit_tail = jax.jit(
            lambda p, f: self.model.apply({"params": p}, f, mode="tail"))
        self._jit_body_u8 = jax.jit(
            lambda p, x: self.model.apply(
                {"params": p}, x.astype(jnp.float32) / 255.0, mode="body"))
        self._jit_tail_u8 = jax.jit(
            lambda p, f: jnp.clip(
                self.model.apply({"params": p}, f, mode="tail")
                * 255.0 + 0.5, 0.0, 255.0,
            ).astype(jnp.uint8))

    def _split_chunks(self, n: int, h: int, w: int) -> tuple[int, int]:
        """(body chunk, tail chunk) for the two-program path — the largest
        divisors of n under each cap, so every chunk shares one compiled
        shape. Body activations are s2d 256-ch at H/2 (small); the tail's
        two live 4x-res 64-ch activations (+ layout pad) set its HBM cap."""
        import os

        def cap_divisor(cap):
            cap = max(1, int(cap))
            return max((d for d in range(1, n + 1) if n % d == 0 and d <= cap),
                       default=1)

        out_px = (4 * h) * (4 * w)
        per_frame = (out_px * 64 * jnp.dtype(self.model.dtype).itemsize * 2.2
                     + out_px * 16)
        tail_cap = (int(os.environ.get("CONTROLANIMATE_UPK_TAIL_CHUNK", "0"))
                    or max(1, int(6e9 // per_frame)))
        body_cap = (int(os.environ.get("CONTROLANIMATE_UPK_BODY_CHUNK", "0"))
                    or 16)
        return cap_divisor(body_cap), cap_divisor(tail_cap)

    def upscale_batch(self, frames: np.ndarray) -> np.ndarray:
        """(F, H, W, 3) uint8 -> (F, H*s, W*s, 3) uint8."""
        F, H, W = frames.shape[:3]
        x = jnp.asarray(frames, jnp.float32) / 255.0
        if self._split_ok(H, W):
            self._ensure_split_jits()
            cb, ct = self._split_chunks(F, H, W)
            feats = [self._jit_body(self.params, x[i:i + cb])
                     for i in range(0, F, cb)]
            feat = feats[0] if len(feats) == 1 else jnp.concatenate(feats)
            y = np.concatenate([
                np.asarray(self._jit_tail(self.params, feat[i:i + ct]))
                for i in range(0, F, ct)
            ]).clip(0, 1)
            out = (y * 255.0 + 0.5).astype(np.uint8)
            return self._post_resize(frames, out)
        run = lambda xc: self._jit(self.params, xc)
        c = self._hbm_chunk(F, H, W)
        y = np.concatenate([
            np.asarray(run(x[i:i + c])) for i in range(0, F, c)
        ]).clip(0, 1)
        out = (y * 255.0 + 0.5).astype(np.uint8)
        return self._post_resize(frames, out)

    def _post_resize(self, frames: np.ndarray, out: np.ndarray) -> np.ndarray:
        if abs(self.scale - 4.0) > 1e-6:
            import cv2

            h = int(frames.shape[1] * self.scale)
            w = int(frames.shape[2] * self.scale)
            out = np.stack([
                cv2.resize(f, (w, h), interpolation=cv2.INTER_LANCZOS4) for f in out
            ])
        return out

    def upscale_batch_device(self, frames_dev) -> "jnp.ndarray":
        """Device-resident path: (F, H, W, 3) uint8 device array ->
        (F, 4H, 4W, 3) uint8 device array, no host round trip. Raises
        ValueError when the host path is required (non-4x scale or an active
        face enhancer)."""
        if abs(self.scale - 4.0) > 1e-6 or self.face_enhancer is not None:
            raise ValueError("device upscale path requires scale=4 and no face enhancer")
        if not hasattr(self, "_jit_u8"):
            self._jit_u8 = jax.jit(
                lambda p, x: jnp.clip(
                    self.model.apply({"params": p}, x.astype(jnp.float32) / 255.0)
                    * 255.0 + 0.5,
                    0.0, 255.0,
                ).astype(jnp.uint8)
            )
        F, H, W = (int(s) for s in frames_dev.shape[:3])
        if self._split_ok(H, W):
            # two programs/frame-chunk: batch each to amortize the tunnel's
            # ~25ms per-program launch floor (NOT pipelined away across
            # dependent programs, perf/upconv_r5.json streamed arm); the
            # body's activations are small (s2d 256-ch at H/2) so it takes
            # big batches, the tail's 4x-res 64-ch activations cap its chunk
            self._ensure_split_jits()
            cb, ct = self._split_chunks(F, H, W)
            feats = [self._jit_body_u8(self.params, frames_dev[i:i + cb])
                     for i in range(0, F, cb)]
            feat = feats[0] if len(feats) == 1 else jnp.concatenate(feats)
            outs = [self._jit_tail_u8(self.params, feat[i:i + ct])
                    for i in range(0, F, ct)]
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        run = lambda xc: self._jit_u8(self.params, xc)
        c = self._hbm_chunk(F, H, W)
        if c >= F:
            return run(frames_dev)
        # chunks dispatch back-to-back (device serializes them; each chunk's
        # HBM peak is bounded) and concatenate device-side
        return jnp.concatenate([
            run(frames_dev[i:i + c]) for i in range(0, F, c)
        ])

    def process_batch(self, frames: np.ndarray) -> np.ndarray:
        """Whole-window path: the RRDB upscale always runs as ONE jitted
        batch; the face enhancer (when present) runs per frame around it
        (the reference upscales frame-at-a-time either way,
        modules/upscaler.py:63-74).

        Face-enhanced dataflow matches the reference's
        GFPGANer(upscale=scale, bg_upsampler=RealESRGAN): RealESRGAN
        upscales the BACKGROUND; aligned faces are restored from the
        original-resolution frame and pasted into that background through
        the scaled inverse affine — faces are never re-degraded by a second
        pass through the upscaler."""
        frames = np.asarray(frames, np.uint8)
        if self.face_enhancer is None:
            return self.upscale_batch(frames)
        if self.upscale_first:
            # documented-but-force-disabled reference option
            # (upscaler.py:23): upscale, then restore faces in place at 1x
            up = self.upscale_batch(frames)
            return np.stack([self.face_enhancer.enhance(f) for f in up])
        bg = self.upscale_batch(frames)
        return np.stack([
            self.face_enhancer.enhance(f, background=b, upscale=self.scale)
            for f, b in zip(frames, bg)
        ])

    def __call__(self, frame: np.ndarray) -> np.ndarray:
        """upscale_first ordering per config (reference documents the option
        but force-overwrites it to False, upscaler.py:23 — honored here)."""
        return self.process_batch(frame[None])[0]
