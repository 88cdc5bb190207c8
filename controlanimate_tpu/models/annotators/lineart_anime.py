"""Lineart-anime annotator: pix2pix UnetGenerator(3, 1, 8, 64) in Flax.

Parity with controlnet_aux's LineartAnimeDetector torch model
(reference: modules/controlresiduals_pipeline.py:58 loads lineart-anime).
Recursive U-Net skip blocks with InstanceNorm (no affine), LeakyReLU-down /
ReLU-up, tanh output.
"""

from __future__ import annotations

from pathlib import Path
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...weights import ingest
from .edge_nets import InstanceNorm

_CACHE: dict = {}


def _ladder(ngf: int = 64, num_downs: int = 8) -> list[tuple[int, int]]:
    """(outer_nc, inner_nc) per level, outermost first (pix2pix UnetGenerator
    construction order: innermost ngf*8/ngf*8, 3 middle ngf*8 blocks, then
    ngf*4, ngf*2, ngf, outermost output_nc/ngf)."""
    levels = [(1, ngf), (ngf, ngf * 2), (ngf * 2, ngf * 4), (ngf * 4, ngf * 8)]
    levels += [(ngf * 8, ngf * 8)] * (num_downs - 4)
    return levels


class UnetSkipBlock(nn.Module):
    ladder: tuple  # remaining (outer, inner) pairs, this level first
    outermost: bool = False

    @nn.compact
    def __call__(self, x):
        outer_nc, inner_nc = self.ladder[0]
        innermost = len(self.ladder) == 1
        h = x
        if not self.outermost:
            h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Conv(inner_nc, (4, 4), strides=2, padding=1, name="downconv")(h)
        if not self.outermost and not innermost:
            h = InstanceNorm()(h)

        if not innermost:
            h = UnetSkipBlock(ladder=self.ladder[1:], name="submodule")(h)

        h = nn.relu(h)
        h = nn.ConvTranspose(
            outer_nc, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            transpose_kernel=True, name="upconv",
        )(h)
        if self.outermost:
            return jnp.tanh(h)
        h = InstanceNorm()(h)
        return jnp.concatenate([x, h], axis=-1)


class UnetGeneratorAnime(nn.Module):
    """UnetGenerator(3, 1, num_downs=8, ngf=64)."""

    ngf: int = 64
    num_downs: int = 8

    @nn.compact
    def __call__(self, x):
        return UnetSkipBlock(
            ladder=tuple(_ladder(self.ngf, self.num_downs)), outermost=True, name="outer"
        )(x)


def _torch_prefixes(num_downs: int = 8) -> list[str]:
    """Torch Sequential key prefix per nesting level, outermost first.

    UnetGenerator.model is the outermost block; each block's Sequential is
    its `.model` attribute. Outermost sequence: [downconv(0), submodule(1),
    uprelu, upconv(3), tanh]; middle: [downrelu, downconv(1), downnorm,
    submodule(3), uprelu, upconv(5), upnorm]; innermost: [downrelu,
    downconv(1), uprelu, upconv(3), upnorm]."""
    prefixes = ["model.model"]
    p = "model.model.1.model"
    for _ in range(num_downs - 1):
        prefixes.append(p)
        p = p + ".3.model"
    return prefixes


def anime_params_from_torch(sd: dict[str, np.ndarray], num_downs: int = 8) -> dict:
    prefixes = _torch_prefixes(num_downs)

    def conv(t):
        return {"kernel": ingest.conv_kernel(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}

    def deconv(t):
        w = sd[f"{t}.weight"]  # (I, O, kh, kw) -> transpose_kernel (kh, kw, O, I)
        return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": sd[f"{t}.bias"]}

    node: dict = {}
    root = node
    for level, p in enumerate(prefixes):
        outermost = level == 0
        innermost = level == num_downs - 1
        down_idx = 0 if outermost else 1
        if innermost:
            up_idx = 3
        elif outermost:
            up_idx = 3
        else:
            up_idx = 5
        name = "outer" if outermost else "submodule"
        if not outermost:
            parent = node
            node = parent.setdefault("submodule", {})
        else:
            node = root.setdefault("outer", {})
        node["downconv"] = conv(f"{p}.{down_idx}")
        node["upconv"] = deconv(f"{p}.{up_idx}")
    return root


def run(frames: np.ndarray, weight_dir: Path) -> np.ndarray:
    weight_file = Path(weight_dir) / "netG.pth"
    if not weight_file.exists():
        raise FileNotFoundError(f"lineart_anime needs weights at {weight_file}")
    key = str(weight_file)
    if key not in _CACHE:
        sd = ingest.load_state_dict(weight_file)
        model = UnetGeneratorAnime()
        params = anime_params_from_torch(sd)
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
        _CACHE[key] = (fn, jax.device_put(params))
    fn, params = _CACHE[key]

    F, H, W, _ = frames.shape
    # pad to a multiple of 256 (8 stride-2 levels)
    import cv2

    Hp = 256 * int(np.ceil(H / 256))
    Wp = 256 * int(np.ceil(W / 256))
    x = np.stack([cv2.resize(f, (Wp, Hp), interpolation=cv2.INTER_CUBIC) for f in frames])
    x = jnp.asarray(x, jnp.float32) / 127.5 - 1.0
    y = np.asarray(fn(params, x))[..., 0]  # (F, Hp, Wp) in [-1, 1]
    y = (y + 1) / 2
    maps = np.stack([cv2.resize(m, (W, H), interpolation=cv2.INTER_CUBIC) for m in y])
    # invert: ControlNet anime-lineart consumes white-on-black lines
    return np.repeat((1.0 - maps)[..., None], 3, axis=3).astype(np.float32)
