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
    growth: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = x.shape[-1]
        c1 = lrelu(nn.Conv(self.growth, (3, 3), padding=1, name="conv1", dtype=self.dtype)(x))
        c2 = lrelu(nn.Conv(self.growth, (3, 3), padding=1, name="conv2", dtype=self.dtype)(
            jnp.concatenate([x, c1], -1)))
        c3 = lrelu(nn.Conv(self.growth, (3, 3), padding=1, name="conv3", dtype=self.dtype)(
            jnp.concatenate([x, c1, c2], -1)))
        c4 = lrelu(nn.Conv(self.growth, (3, 3), padding=1, name="conv4", dtype=self.dtype)(
            jnp.concatenate([x, c1, c2, c3], -1)))
        c5 = nn.Conv(feats, (3, 3), padding=1, name="conv5", dtype=self.dtype)(
            jnp.concatenate([x, c1, c2, c3, c4], -1))
        return x + 0.2 * c5


class RRDB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ResidualDenseBlock(name="rdb1", dtype=self.dtype)(x)
        h = ResidualDenseBlock(name="rdb2", dtype=self.dtype)(h)
        h = ResidualDenseBlock(name="rdb3", dtype=self.dtype)(h)
        return x + 0.2 * h


class RRDBNet(nn.Module):
    num_feat: int = 64
    num_block: int = 6  # anime_6B variant
    scale: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0,1] -> (B, H*scale, W*scale, 3)."""
        feat = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv_first", dtype=self.dtype)(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(name=f"body_{i}", dtype=self.dtype)(body)
        body = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv_body", dtype=self.dtype)(body)
        feat = feat + body
        # nearest-2x + conv3x3 folded into one parity-decomposed conv
        # (ops/upsample.py): exact, 4/9 the MACs on the two largest
        # activations of the network (the up convs run at 2x/4x input res)
        k1, b1 = _ConvParams(self.num_feat, self.num_feat, name="conv_up1")()
        feat = lrelu(upsample2x_conv3x3(feat, k1, b1, dtype=self.dtype))
        k2, b2 = _ConvParams(self.num_feat, self.num_feat, name="conv_up2")()
        if self.scale == 4:
            feat = lrelu(upsample2x_conv3x3(feat, k2, b2, dtype=self.dtype))
        else:
            feat = lrelu(jax.lax.conv_general_dilated(
                feat.astype(self.dtype), k2.astype(self.dtype), (1, 1),
                ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b2.astype(self.dtype))
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding=1, name="conv_hr", dtype=self.dtype)(feat))
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
        self.model = RRDBNet(num_block=num_block, dtype=dtype)
        self.params = jax.device_put(rrdbnet_params_from_torch(ingest.load_state_dict(path), num_block))
        self._jit = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)
        )
        self.face_enhancer = None
        if use_face_enhancer:
            try:
                from .gfpgan import FaceEnhancer

                self.face_enhancer = FaceEnhancer(face_enhancer_model_path)
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

    def upscale_batch(self, frames: np.ndarray) -> np.ndarray:
        """(F, H, W, 3) uint8 -> (F, H*s, W*s, 3) uint8."""
        F, H, W = frames.shape[:3]
        c = self._hbm_chunk(F, H, W)
        x = jnp.asarray(frames, jnp.float32) / 255.0
        y = np.concatenate([
            np.asarray(self._jit(self.params, x[i:i + c])) for i in range(0, F, c)
        ]).clip(0, 1)
        out = (y * 255.0 + 0.5).astype(np.uint8)
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
        c = self._hbm_chunk(F, H, W)
        if c >= F:
            return self._jit_u8(self.params, frames_dev)
        # chunks dispatch back-to-back (device serializes them; each chunk's
        # HBM peak is bounded) and concatenate device-side
        return jnp.concatenate([
            self._jit_u8(self.params, frames_dev[i:i + c]) for i in range(0, F, c)
        ])

    def process_batch(self, frames: np.ndarray) -> np.ndarray:
        """Whole-window path: the RRDB upscale always runs as ONE jitted
        batch; the face enhancer (when present) runs per frame around it
        (the reference upscales frame-at-a-time either way,
        modules/upscaler.py:63-74)."""
        frames = np.asarray(frames, np.uint8)
        if self.face_enhancer is None:
            return self.upscale_batch(frames)
        if self.upscale_first:
            up = self.upscale_batch(frames)
            return np.stack([self.face_enhancer(f) for f in up])
        enhanced = np.stack([self.face_enhancer(f) for f in frames])
        return self.upscale_batch(enhanced)

    def __call__(self, frame: np.ndarray) -> np.ndarray:
        """upscale_first ordering per config (reference documents the option
        but force-overwrites it to False, upscaler.py:23 — honored here)."""
        if self.face_enhancer is None:
            return self.upscale_batch(frame[None])[0]
        if self.upscale_first:
            out = self.upscale_batch(frame[None])[0]
            return self.face_enhancer(out)
        return self.upscale_batch(self.face_enhancer(frame)[None])[0]
