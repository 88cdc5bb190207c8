"""DPT monocular depth estimator in Flax (plain-ViT variant, e.g.
Intel/dpt-large layout).

Upgrades the depth annotator (reference: modules/controlresiduals_pipeline.py:63
uses an HF depth-estimation torch pipeline) to an on-device Flax model:
ViT backbone with 4 tap layers, 'project' readout, reassemble + feature
fusion neck, depth head. Golden-tested against transformers'
DPTForDepthEstimation with identical random weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...weights import ingest


class ViTLayer(nn.Module):
    heads: int
    mlp_dim: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = nn.LayerNorm(epsilon=self.eps, name="layernorm_before")(x)
        q = nn.Dense(C, name="query")(h).reshape(B, N, self.heads, C // self.heads)
        k = nn.Dense(C, name="key")(h).reshape(B, N, self.heads, C // self.heads)
        v = nn.Dense(C, name="value")(h).reshape(B, N, self.heads, C // self.heads)
        from ...ops.attention import reference_attention

        a = reference_attention(q, k, v).reshape(B, N, C)
        x = x + nn.Dense(C, name="attn_out")(a)
        h = nn.LayerNorm(epsilon=self.eps, name="layernorm_after")(x)
        h = nn.gelu(nn.Dense(self.mlp_dim, name="intermediate")(h), approximate=False)
        return x + nn.Dense(C, name="output")(h)


def _resize_align_corners(x: jnp.ndarray, nh: int, nw: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch F.interpolate
    convention used by DPT's fusion stage)."""

    def axis_interp(arr, new, axis):
        old = arr.shape[axis]
        if old == 1:
            reps = [1] * arr.ndim
            reps[axis] = new
            return jnp.tile(arr, reps)
        pos = jnp.arange(new) * (old - 1) / (new - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, old - 1)
        w = (pos - lo).astype(arr.dtype)
        shape = [1] * arr.ndim
        shape[axis] = new
        w = w.reshape(shape)
        return jnp.take(arr, lo, axis=axis) * (1 - w) + jnp.take(arr, hi, axis=axis) * w

    x = axis_interp(x, nh, 1)
    return axis_interp(x, nw, 2)


class DPTPreActResidual(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(x.shape[-1], (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(x.shape[-1], (3, 3), padding=1, name="conv2")(h)
        return x + h


class DPTFusionLayer(nn.Module):
    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            if skip.shape[1] != x.shape[1]:
                skip = jax.image.resize(skip, x.shape, "bilinear")
            x = x + DPTPreActResidual(name="residual_layer1")(skip)
        x = DPTPreActResidual(name="residual_layer2")(x)
        B, H, W, C = x.shape
        x = _resize_align_corners(x, H * 2, W * 2)
        return nn.Conv(C, (1, 1), name="projection")(x)


class DPTDepth(nn.Module):
    """DPT with a plain ViT backbone ('project' readout)."""

    hidden_size: int = 1024
    num_layers: int = 24
    heads: int = 16
    mlp_dim: int = 4096
    patch: int = 16
    taps: tuple[int, ...] = (5, 11, 17, 23)
    neck_hidden: tuple[int, ...] = (256, 512, 1024, 1024)
    fusion_hidden: int = 256

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) normalized -> depth (B, H, W)."""
        B, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        patches = nn.Conv(
            self.hidden_size, (self.patch, self.patch), strides=self.patch,
            name="patch_embeddings",
        )(x).reshape(B, gh * gw, self.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.hidden_size))
        pos = self.param(
            "position_embeddings", nn.initializers.zeros,
            (1, gh * gw + 1, self.hidden_size),
        )
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.hidden_size)), patches], 1)
        h = h + pos

        tapped = []
        for i in range(self.num_layers):
            h = ViTLayer(self.heads, self.mlp_dim, name=f"layer_{i}")(h)
            if i in self.taps:
                tapped.append(h)

        # reassemble: 'project' readout + per-level resize
        feats = []
        for li, t in enumerate(tapped):
            cls_tok, tokens = t[:, :1], t[:, 1:]
            readout = jnp.concatenate(
                [tokens, jnp.broadcast_to(cls_tok, tokens.shape)], axis=-1
            )
            r = nn.gelu(
                nn.Dense(self.hidden_size, name=f"readout_{li}")(readout),
                approximate=False,
            )
            f = r.reshape(B, gh, gw, self.hidden_size)
            f = nn.Conv(self.neck_hidden[li], (1, 1), name=f"reassemble_proj_{li}")(f)
            if li == 0:
                f = nn.ConvTranspose(
                    self.neck_hidden[li], (4, 4), strides=(4, 4), padding="VALID",
                    transpose_kernel=True, name="resize_0",
                )(f)
            elif li == 1:
                f = nn.ConvTranspose(
                    self.neck_hidden[li], (2, 2), strides=(2, 2), padding="VALID",
                    transpose_kernel=True, name="resize_1",
                )(f)
            elif li == 3:
                f = nn.Conv(
                    self.neck_hidden[li], (3, 3), strides=2, padding=1, name="resize_3"
                )(f)
            f = nn.Conv(
                self.fusion_hidden, (3, 3), padding=1, use_bias=False,
                name=f"neck_conv_{li}",
            )(f)
            feats.append(f)

        # fusion from deepest to shallowest
        fused = DPTFusionLayer(name="fusion_3")(feats[3])
        fused = DPTFusionLayer(name="fusion_2")(fused, feats[2])
        fused = DPTFusionLayer(name="fusion_1")(fused, feats[1])
        fused = DPTFusionLayer(name="fusion_0")(fused, feats[0])

        # depth head
        d = nn.Conv(self.fusion_hidden // 2, (3, 3), padding=1, name="head_conv1")(fused)
        Bh, Hh, Wh, Ch = d.shape
        d = jax.image.resize(d, (Bh, Hh * 2, Wh * 2, Ch), "bilinear")
        d = nn.relu(nn.Conv(32, (3, 3), padding=1, name="head_conv2")(d))
        d = nn.relu(nn.Conv(1, (1, 1), name="head_conv3")(d))
        return d[..., 0]


_CACHE: dict = {}

# ImageNet normalization (DPT image processor convention)
_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
_STD = np.array([0.5, 0.5, 0.5], np.float32)


def load_flax_dpt(model_dir):
    """Build the Flax DPT from a local transformers checkpoint (plain-ViT
    variant only; hybrid falls back to the host torch path)."""
    import json
    from pathlib import Path

    from ...weights import ingest as _ingest

    model_dir = Path(model_dir)
    cfg = json.loads((model_dir / "config.json").read_text())
    if cfg.get("is_hybrid", False) or cfg.get("model_type") != "dpt":
        return None
    key = str(model_dir)
    if key not in _CACHE:
        _, sd = _ingest.load_hf_component(model_dir, "")
        taps = tuple(cfg.get("backbone_out_indices", (5, 11, 17, 23)))
        model = DPTDepth(
            hidden_size=cfg.get("hidden_size", 1024),
            num_layers=cfg.get("num_hidden_layers", 24),
            heads=cfg.get("num_attention_heads", 16),
            mlp_dim=cfg.get("intermediate_size", 4096),
            patch=cfg.get("patch_size", 16),
            taps=taps,
            neck_hidden=tuple(cfg.get("neck_hidden_sizes", (256, 512, 1024, 1024))),
            fusion_hidden=cfg.get("fusion_hidden_size", 256),
        )
        params = dpt_params_from_torch(sd, model.num_layers, taps)
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
        _CACHE[key] = (fn, jax.device_put(params), cfg.get("patch_size", 16))
    return _CACHE[key]


def run_flax(frames: np.ndarray, model_dir) -> np.ndarray:
    """(F, H, W, 3) uint8 -> (F, H, W, 3) normalized depth maps, on device."""
    import cv2

    loaded = load_flax_dpt(model_dir)
    if loaded is None:
        raise FileNotFoundError("not a plain-ViT DPT checkpoint")
    fn, params, patch = loaded
    F, H, W, _ = frames.shape
    size = 384  # DPT-large native resolution
    x = np.stack([cv2.resize(f, (size, size), interpolation=cv2.INTER_CUBIC) for f in frames])
    x = (x.astype(np.float32) / 255.0 - _MEAN) / _STD
    depth = np.asarray(fn(params, jnp.asarray(x)))  # (F, size*2, size*2)? head upsamples 2x of /patch grid
    out = []
    for d in depth:
        d = cv2.resize(d, (W, H), interpolation=cv2.INTER_CUBIC)
        d = (d - d.min()) / max(d.max() - d.min(), 1e-8)
        out.append(np.repeat(d[:, :, None], 3, axis=2))
    return np.stack(out).astype(np.float32)


def dpt_params_from_torch(sd: dict[str, np.ndarray], num_layers: int, taps) -> dict:
    """transformers DPTForDepthEstimation state dict -> flax params."""

    def dense(t):
        return {"kernel": ingest.dense_kernel(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}

    def conv(t, bias=True):
        p = {"kernel": ingest.conv_kernel(sd[f"{t}.weight"])}
        if bias:
            p["bias"] = sd[f"{t}.bias"]
        return p

    def deconv(t):
        w = sd[f"{t}.weight"]  # (I, O, kh, kw) -> (kh, kw, O, I) transpose_kernel
        return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": sd[f"{t}.bias"]}

    def ln(t):
        return {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}

    e = "backbone.embeddings" if any(k.startswith("backbone.") for k in sd) else "dpt.embeddings"
    enc = e.replace("embeddings", "encoder")
    params: dict = {
        "cls_token": np.asarray(sd[f"{e}.cls_token"])[0:1],
        "position_embeddings": np.asarray(sd[f"{e}.position_embeddings"]),
        "patch_embeddings": conv(f"{e}.patch_embeddings.projection"),
    }
    for i in range(num_layers):
        p = f"{enc}.layer.{i}"
        params[f"layer_{i}"] = {
            "layernorm_before": ln(f"{p}.layernorm_before"),
            "layernorm_after": ln(f"{p}.layernorm_after"),
            "query": dense(f"{p}.attention.attention.query"),
            "key": dense(f"{p}.attention.attention.key"),
            "value": dense(f"{p}.attention.attention.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
        }
    for li in range(4):
        rp = f"neck.reassemble_stage.layers.{li}"
        params[f"readout_{li}"] = dense(f"neck.reassemble_stage.readout_projects.{li}.0")
        params[f"reassemble_proj_{li}"] = conv(f"{rp}.projection")
        if li in (0, 1):
            params[f"resize_{li}"] = deconv(f"{rp}.resize")
        elif li == 3:
            params[f"resize_{li}"] = conv(f"{rp}.resize")
        params[f"neck_conv_{li}"] = conv(f"neck.convs.{li}", bias=False)
    for li in range(4):
        fp = f"neck.fusion_stage.layers.{3 - li}"
        entry = {
            "projection": conv(f"{fp}.projection"),
            "residual_layer2": {
                "conv1": conv(f"{fp}.residual_layer2.convolution1"),
                "conv2": conv(f"{fp}.residual_layer2.convolution2"),
            },
        }
        if f"{fp}.residual_layer1.convolution1.weight" in sd:
            entry["residual_layer1"] = {
                "conv1": conv(f"{fp}.residual_layer1.convolution1"),
                "conv2": conv(f"{fp}.residual_layer1.convolution2"),
            }
        params[f"fusion_{li}"] = entry
    params["head_conv1"] = conv("head.head.0")
    params["head_conv2"] = conv("head.head.2")
    params["head_conv3"] = conv("head.head.4")
    return params
