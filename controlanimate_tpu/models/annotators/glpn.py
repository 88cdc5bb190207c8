"""GLPN monocular depth estimator in Flax (vinvino02/glpn-nyu layout).

Completes the depth annotator matrix (reference:
modules/controlresiduals_pipeline.py:63 — the HF `depth-estimation` pipeline
accepts GLPN checkpoints): SegFormer-style hierarchical encoder (overlap
patch embeddings, efficient attention with sequence reduction, MixFFN with
depthwise conv) + the selective-feature-fusion decoder and sigmoid depth
head. Golden-tested against transformers GLPNForDepthEstimation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...weights import ingest
from .normalbae_net import BatchNormInference


@dataclass(frozen=True)
class GLPNCfg:
    hidden_sizes: tuple = (32, 64, 160, 256)
    depths: tuple = (2, 2, 2, 2)
    sr_ratios: tuple = (8, 4, 2, 1)
    heads: tuple = (1, 2, 5, 8)
    patch_sizes: tuple = (7, 3, 3, 3)
    strides: tuple = (4, 2, 2, 2)
    mlp_ratios: tuple = (4, 4, 4, 4)
    decoder_hidden: int = 64
    max_depth: float = 10.0
    ln_eps: float = 1e-6

    @staticmethod
    def from_json(cfg: dict) -> "GLPNCfg":
        return GLPNCfg(
            hidden_sizes=tuple(cfg.get("hidden_sizes", (32, 64, 160, 256))),
            depths=tuple(cfg.get("depths", (2, 2, 2, 2))),
            sr_ratios=tuple(cfg.get("sr_ratios", (8, 4, 2, 1))),
            heads=tuple(cfg.get("num_attention_heads", (1, 2, 5, 8))),
            patch_sizes=tuple(cfg.get("patch_sizes", (7, 3, 3, 3))),
            strides=tuple(cfg.get("strides", (4, 2, 2, 2))),
            mlp_ratios=tuple(cfg.get("mlp_ratios", (4, 4, 4, 4))),
            decoder_hidden=cfg.get("decoder_hidden_size", 64),
            max_depth=cfg.get("max_depth", 10.0),
            ln_eps=cfg.get("layer_norm_eps", 1e-6),
        )


class EfficientAttention(nn.Module):
    """SegFormer efficient self-attention: K/V computed on a conv-reduced
    sequence (sr_ratio), queries at full resolution."""

    heads: int
    sr_ratio: int
    ln_eps: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        B, N, C = x.shape
        D = C // self.heads
        q = nn.Dense(C, name="query")(x).reshape(B, N, self.heads, D)
        kv_in = x
        if self.sr_ratio > 1:
            g = x.reshape(B, H, W, C)
            g = nn.Conv(C, (self.sr_ratio, self.sr_ratio), strides=self.sr_ratio,
                        padding="VALID", name="sr")(g)
            kv_in = g.reshape(B, -1, C)
            kv_in = nn.LayerNorm(epsilon=self.ln_eps, use_fast_variance=False,
                                 name="sr_norm")(kv_in)
        M = kv_in.shape[1]
        k = nn.Dense(C, name="key")(kv_in).reshape(B, M, self.heads, D)
        v = nn.Dense(C, name="value")(kv_in).reshape(B, M, self.heads, D)
        from ...ops.attention import reference_attention

        out = reference_attention(q, k, v).reshape(B, N, C)
        return nn.Dense(C, name="out")(out)


class MixFFN(nn.Module):
    """dense1 -> 3x3 depthwise conv -> gelu -> dense2."""

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        B, N, C = x.shape
        h = nn.Dense(self.hidden, name="dense1")(x)
        g = h.reshape(B, H, W, self.hidden)
        g = nn.Conv(self.hidden, (3, 3), padding=1, feature_group_count=self.hidden,
                    name="dwconv")(g)
        h = nn.gelu(g.reshape(B, N, self.hidden), approximate=False)
        return nn.Dense(C, name="dense2")(h)


class GLPNStageLayer(nn.Module):
    heads: int
    sr_ratio: int
    mlp_ratio: int
    ln_eps: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=self.ln_eps, use_fast_variance=False,
                         name="layer_norm_1")(x)
        x = x + EfficientAttention(self.heads, self.sr_ratio, self.ln_eps,
                                   name="attention")(h, H, W)
        h = nn.LayerNorm(epsilon=self.ln_eps, use_fast_variance=False,
                         name="layer_norm_2")(x)
        C = x.shape[-1]
        return x + MixFFN(int(C * self.mlp_ratio), name="mlp")(h, H, W)


class SelectiveFeatureFusion(nn.Module):
    """Attention-weighted blend of local (decoder) and global (skip)
    features (GLPN paper section 3.4)."""

    channels: int

    @nn.compact
    def __call__(self, local: jnp.ndarray, glob: jnp.ndarray) -> jnp.ndarray:
        f = jnp.concatenate([local, glob], axis=-1)
        f = nn.Conv(self.channels, (3, 3), padding=1, name="conv1")(f)
        f = nn.relu(BatchNormInference(1e-5, name="bn1")(f))
        f = nn.Conv(self.channels // 2, (3, 3), padding=1, name="conv2")(f)
        f = nn.relu(BatchNormInference(1e-5, name="bn2")(f))
        attn = jax.nn.sigmoid(nn.Conv(2, (3, 3), padding=1, name="conv3")(f))
        return local * attn[..., 0:1] + glob * attn[..., 1:2]


def _up2(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")


class GLPNDepth(nn.Module):
    """Full GLPNForDepthEstimation graph, channels-last."""

    cfg: GLPNCfg = field(default_factory=GLPNCfg)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) normalized -> depth (B, H, W) in [0, max_depth]."""
        c = self.cfg
        B = x.shape[0]
        feats = []
        h = x.astype(self.dtype)
        for i in range(len(c.hidden_sizes)):
            p = c.patch_sizes[i]
            h = nn.Conv(c.hidden_sizes[i], (p, p), strides=c.strides[i],
                        padding=p // 2, name=f"patch_embed_{i}")(h)
            Hi, Wi = h.shape[1], h.shape[2]
            h = h.reshape(B, Hi * Wi, c.hidden_sizes[i])
            h = nn.LayerNorm(epsilon=c.ln_eps, use_fast_variance=False,
                             name=f"patch_norm_{i}")(h)
            for j in range(c.depths[i]):
                h = GLPNStageLayer(c.heads[i], c.sr_ratios[i], c.mlp_ratios[i],
                                   c.ln_eps, name=f"block_{i}_{j}")(h, Hi, Wi)
            h = nn.LayerNorm(epsilon=c.ln_eps, use_fast_variance=False,
                             name=f"stage_norm_{i}")(h)
            h = h.reshape(B, Hi, Wi, c.hidden_sizes[i])
            feats.append(h)

        # decoder: deepest first; fuse skips; x2 upsample per stage + final x2
        out = None
        dec = c.decoder_hidden
        for si, f in enumerate(feats[::-1]):
            if f.shape[-1] != dec:
                f = nn.Conv(dec, (1, 1), name=f"dec_conv_{si}")(f)
            if si > 0:
                f = SelectiveFeatureFusion(dec, name=f"dec_fusion_{si}")(f, out)
            out = _up2(f)
        out = _up2(out)

        h = nn.Conv(dec, (3, 3), padding=1, name="head_conv1")(out)
        h = nn.relu(h)
        h = nn.Conv(1, (3, 3), padding=1, name="head_conv2")(h)
        return jax.nn.sigmoid(h[..., 0]) * c.max_depth


# ------------------------------------------------------------ weight loading


def glpn_params_from_torch(sd: dict, cfg: GLPNCfg) -> dict:
    """transformers GLPNForDepthEstimation state dict -> flax params."""

    def dense(t):
        return {"kernel": ingest.dense_kernel(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}

    def conv(t):
        return {"kernel": ingest.conv_kernel(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}

    def dwconv(t):
        w = np.asarray(sd[f"{t}.weight"])  # (C, 1, kh, kw)
        return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": sd[f"{t}.bias"]}

    def ln(t):
        return {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}

    def bn(t):
        return {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"],
                "mean": sd[f"{t}.running_mean"], "var": sd[f"{t}.running_var"]}

    e = "glpn.encoder"
    params: dict = {}
    for i in range(len(cfg.hidden_sizes)):
        params[f"patch_embed_{i}"] = conv(f"{e}.patch_embeddings.{i}.proj")
        params[f"patch_norm_{i}"] = ln(f"{e}.patch_embeddings.{i}.layer_norm")
        params[f"stage_norm_{i}"] = ln(f"{e}.layer_norm.{i}")
        for j in range(cfg.depths[i]):
            t = f"{e}.block.{i}.{j}"
            attn: dict = {
                "query": dense(f"{t}.attention.self.query"),
                "key": dense(f"{t}.attention.self.key"),
                "value": dense(f"{t}.attention.self.value"),
                "out": dense(f"{t}.attention.output.dense"),
            }
            if cfg.sr_ratios[i] > 1:
                attn["sr"] = conv(f"{t}.attention.self.sr")
                attn["sr_norm"] = ln(f"{t}.attention.self.layer_norm")
            params[f"block_{i}_{j}"] = {
                "layer_norm_1": ln(f"{t}.layer_norm_1"),
                "layer_norm_2": ln(f"{t}.layer_norm_2"),
                "attention": attn,
                "mlp": {
                    "dense1": dense(f"{t}.mlp.dense1"),
                    "dense2": dense(f"{t}.mlp.dense2"),
                    "dwconv": dwconv(f"{t}.mlp.dwconv.dwconv"),
                },
            }
    for si in range(len(cfg.hidden_sizes)):
        t = f"decoder.stages.{si}"
        if f"{t}.convolution.weight" in sd:
            params[f"dec_conv_{si}"] = conv(f"{t}.convolution")
        if f"{t}.fusion.convolutional_layer1.0.weight" in sd:
            params[f"dec_fusion_{si}"] = {
                "conv1": conv(f"{t}.fusion.convolutional_layer1.0"),
                "bn1": bn(f"{t}.fusion.convolutional_layer1.1"),
                "conv2": conv(f"{t}.fusion.convolutional_layer2.0"),
                "bn2": bn(f"{t}.fusion.convolutional_layer2.1"),
                "conv3": conv(f"{t}.fusion.convolutional_layer3"),
            }
    params["head_conv1"] = conv("head.head.0")
    params["head_conv2"] = conv("head.head.2")
    return params


_CACHE: dict = {}


def run_flax(frames: np.ndarray, model_dir) -> np.ndarray:
    """(F, H, W, 3) uint8 -> (F, H, W, 3) normalized depth maps on device
    (GLPN processor convention: rescale to [0,1], size snapped to /32)."""
    import json
    from pathlib import Path

    import cv2

    model_dir = Path(model_dir)
    cfg_json = json.loads((model_dir / "config.json").read_text())
    if cfg_json.get("model_type") != "glpn":
        raise FileNotFoundError("not a GLPN checkpoint")
    key = str(model_dir)
    if key not in _CACHE:
        _, sd = ingest.load_hf_component(model_dir, "")
        cfg = GLPNCfg.from_json(cfg_json)
        model = GLPNDepth(cfg)
        params = glpn_params_from_torch(sd, cfg)
        _CACHE[key] = (jax.jit(lambda p, x: model.apply({"params": p}, x)), jax.device_put(params))
    fn, params = _CACHE[key]
    F, H, W, _ = frames.shape
    h32, w32 = max(H // 32 * 32, 32), max(W // 32 * 32, 32)
    x = np.stack([cv2.resize(f, (w32, h32), interpolation=cv2.INTER_CUBIC) for f in frames])
    x = x.astype(np.float32) / 255.0
    depth = np.asarray(fn(params, jnp.asarray(x)))
    out = []
    for d in depth:
        d = cv2.resize(d, (W, H), interpolation=cv2.INTER_CUBIC)
        d = (d - d.min()) / max(d.max() - d.min(), 1e-8)
        out.append(np.repeat(d[:, :, None], 3, axis=2))
    return np.stack(out).astype(np.float32)
