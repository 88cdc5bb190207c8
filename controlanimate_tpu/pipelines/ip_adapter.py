"""IP-Adapter: image-prompt conditioning.

Capability parity with the reference's IP-Adapter stack
(reference: modules/ip_adapter.py, modules/resampler.py,
modules/attention_processor.py): a CLIP vision tower embeds the anchor
frame, a projection model lifts it to `num_tokens` context tokens appended
to the text sequence, and the UNet's cross-attentions run a second K/V
(to_k_ip/to_v_ip) over those tokens scaled by `ipa_scale`.

Structural differences (TPU-first):
  * the dual-stream attention lives in the UNet as a constructor flag
    (models/layers.py Attention.ip_tokens) instead of runtime
    attn-processor swaps (reference ip_adapter.py:95-134);
  * IP K/V weights are addressed by structural path, so the reference's
    regex index renumbering (ip_adapter.py:163-185, needed because motion
    modules shift torch module iteration order) does not exist here.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.clip import CLIPVisionConfig, CLIPVisionModelWithProjection
from ..weights import ingest
from ..weights.clip_weights import vision_params_from_torch
from ..weights.ingest import dense_kernel

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _ln(name: str) -> nn.LayerNorm:
    """torch-parity LayerNorm: eps=1e-5 and exact (two-pass) variance —
    flax's default fast variance (E[x^2]-E[x]^2) loses ~1e-4 on the
    large-magnitude activations these projections produce."""
    return nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name=name)


class ImageProjModel(nn.Module):
    """Linear projection of the global CLIP image embedding into
    `num_tokens` context tokens (reference: ip_adapter.py:30-47)."""

    cross_attention_dim: int = 768
    num_tokens: int = 4

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        B = image_embeds.shape[0]
        x = nn.Dense(self.num_tokens * self.cross_attention_dim, name="proj")(image_embeds)
        x = x.reshape(B, self.num_tokens, self.cross_attention_dim)
        return _ln("norm")(x)


class MLPProjModel(nn.Module):
    """IP-Adapter-Full projection: token-wise GELU MLP + LayerNorm over the
    penultimate CLIP hidden states (reference: modules/ip_adapter.py:50-64 —
    torch Sequential(Linear, GELU, Linear, LayerNorm), applied to all 257
    vision tokens by IPAdapterFull.get_image_embeds)."""

    cross_attention_dim: int = 768

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(image_embeds.shape[-1], name="proj_0")(image_embeds)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default is exact erf
        h = nn.Dense(self.cross_attention_dim, name="proj_2")(h)
        h = _ln("norm")(h)
        return h[:, None, :] if h.ndim == 2 else h


class PerceiverAttention(nn.Module):
    """Cross-attention where queries are learned latents and K/V span
    [image tokens, latents] (reference: modules/resampler.py:34-78)."""

    dim: int
    dim_head: int = 64
    heads: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim_head * self.heads
        x = _ln("norm1")(x)
        latents = _ln("norm2")(latents)
        B, L, _ = latents.shape
        kv_input = jnp.concatenate([x, latents], axis=-2)
        q = nn.Dense(inner, use_bias=False, name="to_q")(latents)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)
        N = kv_input.shape[1]
        q = q.reshape(B, L, self.heads, self.dim_head)
        k = k.reshape(B, N, self.heads, self.dim_head)
        v = v.reshape(B, N, self.heads, self.dim_head)
        # reference scales q and k by sqrt(scale) each (resampler.py:64-66)
        from ..ops.attention import reference_attention

        out = reference_attention(q, k, v)
        out = out.reshape(B, L, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class Resampler(nn.Module):
    """Perceiver resampler for IP-Adapter-Plus
    (reference: modules/resampler.py:81-147): learned query latents attend
    to the CLIP penultimate hidden states over `depth` layers."""

    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 768
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        latents = self.param(
            "latents",
            lambda k, s: jax.random.normal(k, s) / (self.dim**0.5),
            (1, self.num_queries, self.dim),
        )
        latents = jnp.broadcast_to(latents, (B, self.num_queries, self.dim))
        x = nn.Dense(self.dim, name="proj_in")(x)
        for i in range(self.depth):
            latents = latents + PerceiverAttention(
                self.dim, self.dim_head, self.heads, name=f"layers_{i}_attn"
            )(x, latents)
            h = _ln(f"layers_{i}_ff_norm")(latents)
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False, name=f"layers_{i}_ff_0")(h)
            h = nn.gelu(h, approximate=False)  # torch nn.GELU default
            h = nn.Dense(self.dim, use_bias=False, name=f"layers_{i}_ff_2")(h)
            latents = latents + h
        out = nn.Dense(self.output_dim, name="proj_out")(latents)
        return _ln("norm_out")(out)


def preprocess_clip_image(frame: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 (H, W, 3) -> CLIP-normalized float (1, size, size, 3)."""
    import cv2

    img = cv2.resize(np.asarray(frame, np.uint8), (size, size), interpolation=cv2.INTER_CUBIC)
    img = img.astype(np.float32) / 255.0
    img = (img - CLIP_MEAN) / CLIP_STD
    return img[None]


class Projection(NamedTuple):
    """Result of checkpoint-layout detection: the Flax projection module, its
    converted params, the context-token count, which vision-tower output feeds
    it, and the detected checkpoint variant
    (base | plus | full | xl | plus-xl)."""

    model: nn.Module
    params: dict
    num_tokens: int
    embed_source: str
    variant: str


SDXL_CROSS_ATTENTION_DIM = 2048


class IPAdapter:
    """Host-side bundle: CLIP vision tower + projection + UNet K/V weights."""

    def __init__(
        self,
        vision_model: Optional[CLIPVisionModelWithProjection],
        vision_params: Any,
        proj_model: ImageProjModel,
        proj_params: Any,
        ip_sd: Optional[dict] = None,
        num_tokens: int = 4,
        embed_source: str = "image_embeds",
        variant: str = "base",
    ):
        self.vision_model = vision_model
        self.vision_params = vision_params
        self.proj_model = proj_model
        self.proj_params = proj_params
        self.ip_sd = ip_sd or {}
        self.num_tokens = num_tokens
        # which vision-tower output feeds the projection: the base adapter
        # uses the projected global embedding, Plus/Full the penultimate
        # hidden states (reference: ip_adapter.py:187-197 vs :370-380)
        self.embed_source = embed_source
        self.variant = variant
        self._embed_cache: dict = {}
        self._uncond_cache: Optional[jnp.ndarray] = None

    # --------------------------------------------------- checkpoint detection
    @staticmethod
    def build_projection(image_proj_sd: dict, vcfg: Optional[CLIPVisionConfig],
                         cross_attention_dim: int = 768):
        """Detect the checkpoint variant from its image_proj key layout and
        build a `Projection` (module, params, num_tokens, embed_source,
        variant).

        Layouts (reference: modules/ip_adapter.py / modules/resampler.py):
          base  ip-adapter_sd15:      proj.weight / norm.weight  (ImageProjModel)
          plus  ip-adapter-plus_sd15: latents / proj_in / layers.* (Resampler)
          full  ip-adapter-full-face: proj.0 / proj.2 / proj.3   (MLP Sequential)
          xl    ip-adapter_sdxl:      same layout as base, but the projection
                targets SDXL's 2048-dim cross-attention (reference
                IPAdapterXL, modules/ip_adapter.py:288-350 — init_proj is
                inherited from IPAdapter with the SDXL UNet's dim)
          plus-xl ip-adapter-plus_sdxl: same layout as plus with
                dim=1280/heads=20 latents and a 2048-dim proj_out
                (reference IPAdapterPlusXL, modules/ip_adapter.py:396-419)

        The SDXL-family variants are detected and built as standalone
        projection models (usable via `project`/`embed_image`); driving them
        through the engine requires an SDXL UNet, which is outside the SD1.5
        product path — the reference's own pipelines never instantiate its XL
        classes either (no call sites outside modules/ip_adapter.py).
        """
        sd = {k: np.asarray(v) for k, v in image_proj_sd.items()}
        if "latents" in sd:  # -------------------------------------- Plus
            latents = sd["latents"]
            dim = int(latents.shape[-1])
            num_queries = int(latents.shape[1])
            depth = len({k.split(".")[1] for k in sd if k.startswith("layers.")})
            # head count is not recoverable from the checkpoint alone; the
            # reference always builds dim_head=64 (ip_adapter.py:356-365),
            # so infer heads from the attention inner width
            dim_head = 64
            inner = int(sd["layers.0.0.to_q.weight"].shape[0])
            model = Resampler(
                dim=dim, depth=depth, dim_head=dim_head, heads=inner // dim_head,
                num_queries=num_queries,
                embedding_dim=int(sd["proj_in.weight"].shape[1]),
                output_dim=int(sd["proj_out.weight"].shape[0]),
            )
            params: dict = {
                "latents": latents,
                "proj_in": {"kernel": dense_kernel(sd["proj_in.weight"]),
                            "bias": sd["proj_in.bias"]},
                "proj_out": {"kernel": dense_kernel(sd["proj_out.weight"]),
                             "bias": sd["proj_out.bias"]},
                "norm_out": {"scale": sd["norm_out.weight"], "bias": sd["norm_out.bias"]},
            }
            variant = (
                "plus-xl"
                if int(sd["proj_out.weight"].shape[0]) == SDXL_CROSS_ATTENTION_DIM
                else "plus"
            )
            for i in range(depth):
                a = f"layers.{i}.0"
                params[f"layers_{i}_attn"] = {
                    "norm1": {"scale": sd[f"{a}.norm1.weight"], "bias": sd[f"{a}.norm1.bias"]},
                    "norm2": {"scale": sd[f"{a}.norm2.weight"], "bias": sd[f"{a}.norm2.bias"]},
                    "to_q": {"kernel": dense_kernel(sd[f"{a}.to_q.weight"])},
                    "to_kv": {"kernel": dense_kernel(sd[f"{a}.to_kv.weight"])},
                    "to_out": {"kernel": dense_kernel(sd[f"{a}.to_out.weight"])},
                }
                f = f"layers.{i}.1"
                params[f"layers_{i}_ff_norm"] = {
                    "scale": sd[f"{f}.0.weight"], "bias": sd[f"{f}.0.bias"]}
                params[f"layers_{i}_ff_0"] = {"kernel": dense_kernel(sd[f"{f}.1.weight"])}
                params[f"layers_{i}_ff_2"] = {"kernel": dense_kernel(sd[f"{f}.3.weight"])}
            return Projection(model, params, num_queries, "penultimate", variant)

        if "proj.0.weight" in sd:  # -------------------------------- Full
            cross = int(sd["proj.2.weight"].shape[0])
            model = MLPProjModel(cross_attention_dim=cross)
            params = {
                "proj_0": {"kernel": dense_kernel(sd["proj.0.weight"]),
                           "bias": sd["proj.0.bias"]},
                "proj_2": {"kernel": dense_kernel(sd["proj.2.weight"]),
                           "bias": sd["proj.2.bias"]},
                "norm": {"scale": sd["proj.3.weight"], "bias": sd["proj.3.bias"]},
            }
            if vcfg is None:
                raise ValueError("IP-Adapter-Full needs the vision config to "
                                 "determine its token count")
            num_tokens = (vcfg.image_size // vcfg.patch_size) ** 2 + 1
            return Projection(model, params, num_tokens, "penultimate", "full")

        if "proj.weight" in sd:  # ----------------------------- base / xl
            rows = int(sd["proj.weight"].shape[0])
            cross = cross_attention_dim
            if rows % cross != 0:
                # the projection's row count must be num_tokens * cross-dim;
                # when it isn't compatible with the caller's (SD1.5) dim, the
                # checkpoint is the SDXL-family base adapter (reference
                # IPAdapterXL: 4 tokens x 2048 = 8192 rows)
                if rows % SDXL_CROSS_ATTENTION_DIM != 0:
                    raise ValueError(
                        f"IP-Adapter proj.weight has {rows} rows, not a "
                        f"multiple of cross-attention dim {cross} (SD1.5) or "
                        f"{SDXL_CROSS_ATTENTION_DIM} (SDXL)"
                    )
                cross = SDXL_CROSS_ATTENTION_DIM
            variant = "xl" if cross == SDXL_CROSS_ATTENTION_DIM else "base"
            num_tokens = rows // cross
            model = ImageProjModel(cross_attention_dim=cross,
                                   num_tokens=num_tokens)
            params = {
                "proj": {"kernel": dense_kernel(sd["proj.weight"]),
                         "bias": sd["proj.bias"]},
                "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
            }
            return Projection(model, params, num_tokens, "image_embeds", variant)

        raise ValueError(
            f"unrecognized IP-Adapter image_proj layout: {sorted(sd)[:6]}..."
        )

    @classmethod
    def from_config(cls, config) -> "IPAdapter":
        enc_path = config.ipadapter_image_encoder_path or "models/IP-Adapter/image_encoder"
        ckpt_path = config.ipadapter_ckpt_path or "models/IP-Adapter/ip-adapter_sd15.bin"
        if not Path(ckpt_path).exists():
            raise FileNotFoundError(
                f"IP-Adapter checkpoint {ckpt_path} not found (reference default "
                "paths: modules/controlanimate_pipeline.py:77-80)"
            )
        sd = ingest.load_state_dict(ckpt_path)
        image_proj_sd = {k[len("image_proj."):]: v for k, v in sd.items() if k.startswith("image_proj.")}
        ip_sd = {k[len("ip_adapter."):]: v for k, v in sd.items() if k.startswith("ip_adapter.")}

        cfg_json = {}
        cfg_file = Path(enc_path) / "config.json"
        if cfg_file.exists():
            cfg_json = json.loads(cfg_file.read_text()).get("vision_config", json.loads(cfg_file.read_text()))
        vcfg = CLIPVisionConfig.from_json(cfg_json)
        vm = CLIPVisionModelWithProjection(vcfg)
        _, v_sd = ingest.load_hf_component(enc_path, "")
        v_params = vision_params_from_torch(v_sd, vcfg.num_layers)

        proj, proj_params, num_tokens, embed_source, variant = cls.build_projection(
            image_proj_sd, vcfg
        )
        return cls(vm, v_params, proj, proj_params, ip_sd=ip_sd,
                   num_tokens=num_tokens, embed_source=embed_source,
                   variant=variant)

    @classmethod
    def random_init(cls, clip_embed_dim: int = 16, cross_attention_dim: int = 768,
                    num_tokens: int = 4, key=None) -> "IPAdapter":
        """Weight-free construction for tests (no vision tower: callers embed
        via `project` directly)."""
        proj = ImageProjModel(cross_attention_dim=cross_attention_dim, num_tokens=num_tokens)
        params = proj.init(key or jax.random.PRNGKey(0), jnp.zeros((1, clip_embed_dim)))["params"]
        return cls(None, None, proj, params, num_tokens=num_tokens)

    # ---------------------------------------------------------------- embeds
    def project(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        return self.proj_model.apply({"params": self.proj_params}, image_embeds)

    def embed_image(self, frame: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """anchor frame uint8 (H, W, 3) -> (cond_tokens, uncond_tokens), each
        (1, num_tokens, 768). Single-frame view of `embed_images` (one source
        of truth for the cond/uncond semantics)."""
        return self.embed_images(np.asarray(frame)[None])

    def embed_images(self, frames: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Batched anchor embed: uint8 (S, H, W, 3) -> (cond, uncond), each
        (S, num_tokens, 768). One vision-tower dispatch for all S anchors
        (segment-parallel vid2vid; a per-anchor Python loop would pay the
        dispatch floor S times per window).

        base: uncond = projection of zero EMBEDS (reference ip_adapter.py:197);
        plus/full: uncond = projection of the penultimate states of a zero
        IMAGE (reference ip_adapter.py:377-380). Both are anchor-independent,
        so they compute once, cache, and broadcast."""
        if self.vision_model is None:
            raise RuntimeError("IPAdapter built without a vision tower")
        frames = np.asarray(frames, np.uint8)
        px = jnp.concatenate(
            [jnp.asarray(preprocess_clip_image(f)) for f in frames], axis=0
        )
        out = self.vision_model.apply({"params": self.vision_params}, px)
        S = px.shape[0]
        if self.embed_source == "penultimate":
            cond = self.project(out["penultimate_hidden_states"])
            if self._uncond_cache is None:
                zero_out = self.vision_model.apply(
                    {"params": self.vision_params}, jnp.zeros_like(px[:1])
                )
                self._uncond_cache = self.project(zero_out["penultimate_hidden_states"])
        else:
            cond = self.project(out["image_embeds"])
            if self._uncond_cache is None:
                self._uncond_cache = self.project(
                    jnp.zeros_like(out["image_embeds"][:1])
                )
        uncond = self._uncond_cache
        return cond, jnp.broadcast_to(uncond, (S, *uncond.shape[1:]))

    # -------------------------------------------------------- UNet injection
    def attn2_paths_in_checkpoint_order(self, ucfg) -> list[str]:
        """Canonical enumeration of cross-attention modules matching the
        original IP-Adapter checkpoint numbering (diffusers SD1.5 module
        order: down_blocks, up_blocks, mid_block)."""
        paths = []
        for i, bt in enumerate(ucfg.down_block_types):
            if not bt.startswith("CrossAttn"):
                continue
            for j in range(ucfg.layers_per_block):
                paths.append(f"down_blocks_{i}_attentions_{j}")
        for i, bt in enumerate(ucfg.up_block_types):
            if not bt.startswith("CrossAttn"):
                continue
            for j in range(ucfg.layers_per_block + 1):
                paths.append(f"up_blocks_{i}_attentions_{j}")
        paths.append("mid_block_attentions_0")
        return paths

    def inject_into_unet_params(self, unet_params: dict, ucfg) -> dict:
        """Write to_k_ip/to_v_ip weights into every attn2 of the param tree.

        Checkpoint keys are '2k+1.to_{k,v}_ip.weight' — attn2 modules sit at
        odd positions of the interleaved attn1/attn2 processor list."""
        if not self.ip_sd:
            return unet_params
        paths = self.attn2_paths_in_checkpoint_order(ucfg)
        for idx, path in enumerate(paths):
            ck = 2 * idx + 1
            kw = self.ip_sd.get(f"{ck}.to_k_ip.weight")
            vw = self.ip_sd.get(f"{ck}.to_v_ip.weight")
            if kw is None or vw is None:
                continue
            attn2 = unet_params[path]["transformer_blocks_0"]["attn2"]
            attn2["to_k_ip"] = {"kernel": dense_kernel(np.asarray(kw))}
            attn2["to_v_ip"] = {"kernel": dense_kernel(np.asarray(vw))}
        return unet_params
