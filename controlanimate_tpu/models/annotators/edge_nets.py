"""Flax ports of the conv-net edge annotators.

Capability parity with controlnet_aux's torch detectors the reference
instantiates (reference: modules/controlresiduals_pipeline.py:56-62):
  * HED (ControlNetHED, Apache2 re-implementation): VGG-style 5-stage
    network with per-stage 1-channel projections, sigmoid of the mean of
    the upsampled stage maps.
  * Lineart: 3-down/3-res/2-up InstanceNorm generator, 1-channel output.

Weights load from local torch checkpoints under
`models/annotators/{ControlNetHED.pth, sk_model.pth}` when present; the
architecture and postprocessing run batched on device.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...weights import ingest

_CACHE: dict = {}


# --------------------------------------------------------------------- HED
class HEDBlock(nn.Module):
    out_channels: int
    layers: int

    @nn.compact
    def __call__(self, x, down_sample: bool = False):
        if down_sample:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(self.layers):
            x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1, name=f"convs_{i}")(x))
        proj = nn.Conv(1, (1, 1), name="projection")(x)
        return x, proj


class ControlNetHED(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in 0..255 RGB; returns list of 5 stage maps."""
        norm = self.param("norm", nn.initializers.zeros, (3,))
        h = x - norm[None, None, None, :]
        h, p1 = HEDBlock(64, 2, name="block1")(h)
        h, p2 = HEDBlock(128, 2, name="block2")(h, down_sample=True)
        h, p3 = HEDBlock(256, 3, name="block3")(h, down_sample=True)
        h, p4 = HEDBlock(512, 3, name="block4")(h, down_sample=True)
        h, p5 = HEDBlock(512, 3, name="block5")(h, down_sample=True)
        return [p1, p2, p3, p4, p5]


def hed_params_from_torch(sd: dict[str, np.ndarray]) -> dict:
    params: dict = {"norm": np.asarray(sd["norm"]).reshape(3)}
    blocks = {"block1": 2, "block2": 2, "block3": 3, "block4": 3, "block5": 3}
    for bname, n in blocks.items():
        b: dict = {}
        for i in range(n):
            b[f"convs_{i}"] = {
                "kernel": ingest.conv_kernel(sd[f"{bname}.convs.{i}.weight"]),
                "bias": sd[f"{bname}.convs.{i}.bias"],
            }
        b["projection"] = {
            "kernel": ingest.conv_kernel(sd[f"{bname}.projection.weight"]),
            "bias": sd[f"{bname}.projection.bias"],
        }
        params[bname] = b
    return params


def hed_postprocess(stage_maps, out_hw) -> jnp.ndarray:
    """Resize stage maps to input size, sigmoid of their mean."""
    H, W = out_hw
    ups = []
    for p in stage_maps:
        B = p.shape[0]
        ups.append(jax.image.resize(p, (B, H, W, 1), "bilinear"))
    mean = jnp.mean(jnp.stack(ups), axis=0)
    return jax.nn.sigmoid(mean)


# ----------------------------------------------------------------- Lineart
class InstanceNorm(nn.Module):
    """InstanceNorm2d without affine (pix2pix generator convention)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class LineartResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = _reflect_pad(x, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID", name="conv1")(h)
        h = nn.relu(InstanceNorm()(h))
        h = _reflect_pad(h, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID", name="conv2")(h)
        return x + InstanceNorm()(h)


class LineartGenerator(nn.Module):
    """controlnet_aux Generator(3, 1, n_residual_blocks=3)."""

    n_residual: int = 3

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0,1]; returns (B, H, W, 1) line map."""
        h = _reflect_pad(x, 3)
        h = nn.Conv(64, (7, 7), padding="VALID", name="conv_in")(h)
        h = nn.relu(InstanceNorm()(h))
        h = nn.Conv(128, (3, 3), strides=2, padding=1, name="down1")(h)
        h = nn.relu(InstanceNorm()(h))
        h = nn.Conv(256, (3, 3), strides=2, padding=1, name="down2")(h)
        h = nn.relu(InstanceNorm()(h))
        for i in range(self.n_residual):
            h = LineartResBlock(256, name=f"res_{i}")(h)
        h = nn.ConvTranspose(128, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)),
                             transpose_kernel=True, name="up1")(h)
        h = nn.relu(InstanceNorm()(h))
        h = nn.ConvTranspose(64, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)),
                             transpose_kernel=True, name="up2")(h)
        h = nn.relu(InstanceNorm()(h))
        h = _reflect_pad(h, 3)
        return jax.nn.sigmoid(nn.Conv(1, (7, 7), padding="VALID", name="conv_out")(h))


def lineart_params_from_torch(sd: dict[str, np.ndarray], n_residual: int = 3) -> dict:
    """pix2pix Generator sequential state dict -> named flax params.

    torch layout: model0.1 conv_in; model1.{0,3} downs; model2.{i}.conv_block
    residuals; model3.{0,3} ups; model4.1 conv_out (indices follow
    controlnet_aux's Sequential ordering)."""

    def conv(prefix):
        return {"kernel": ingest.conv_kernel(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}

    def deconv(prefix):
        # torch ConvTranspose2d weight (I, O, kh, kw) -> flax transpose_kernel
        # layout (kh, kw, O, I); padding ((1,2),(1,2)) == torch padding=1,
        # output_padding=1 (verified against torch numerics)
        w = sd[f"{prefix}.weight"]
        return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": sd[f"{prefix}.bias"]}

    params: dict = {
        "conv_in": conv("model0.1"),
        "down1": conv("model1.0"),
        "down2": conv("model1.3"),
        "up1": deconv("model3.0"),
        "up2": deconv("model3.3"),
        "conv_out": conv("model4.1"),
    }
    for i in range(n_residual):
        params[f"res_{i}"] = {
            "conv1": conv(f"model2.{i}.conv_block.1"),
            "conv2": conv(f"model2.{i}.conv_block.5"),
        }
    return params


# -------------------------------------------------------------- dispatcher
_WEIGHT_FILES = {
    "hed": "ControlNetHED.pth",
    "softedge": "ControlNetHED.pth",  # pidinet pending; HED is the softedge fallback
    "lineart": "sk_model.pth",
    "lineart_anime": "netG.pth",
}


def run(name: str, frames: np.ndarray, weight_dir: Path) -> np.ndarray:
    """frames: (F, H, W, 3) uint8 -> (F, H, W, 3) float [0,1] condition maps."""
    weight_file = weight_dir / _WEIGHT_FILES.get(name, f"{name}.pth")
    if not weight_file.exists():
        raise FileNotFoundError(
            f"annotator {name!r} needs weights at {weight_file} "
            "(reference downloads these via controlnet_aux)"
        )
    key = (name, str(weight_file))
    F, H, W, _ = frames.shape

    if name in ("hed", "softedge"):
        if key not in _CACHE:
            sd = ingest.load_state_dict(weight_file)
            model = ControlNetHED()
            params = hed_params_from_torch(sd)
            fn = jax.jit(
                lambda p, x: hed_postprocess(
                    model.apply({"params": p}, x), (x.shape[1], x.shape[2])
                )
            )
            _CACHE[key] = (fn, jax.device_put(params))
        fn, params = _CACHE[key]
        edge = fn(params, jnp.asarray(frames, jnp.float32))
        return np.repeat(np.asarray(edge), 3, axis=-1)

    if name in ("lineart", "lineart_anime"):
        if key not in _CACHE:
            sd = ingest.load_state_dict(weight_file)
            model = LineartGenerator()
            params = lineart_params_from_torch(sd)
            fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
            _CACHE[key] = (fn, jax.device_put(params))
        fn, params = _CACHE[key]
        line = np.asarray(fn(params, jnp.asarray(frames, jnp.float32) / 255.0))
        # ControlNet lineart models consume inverted (white-on-black) maps
        return np.repeat(1.0 - line, 3, axis=-1)

    raise NotImplementedError(name)
