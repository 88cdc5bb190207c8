"""CLIP text + vision towers in Flax.

Capability parity with the reference's CLIPTextModel text encoder
(reference: modules/controlanimate_pipeline.py:34-35; used by encode_prompt,
animatediff/pipelines/controlanimation_pipeline.py:295-474) and the
CLIPVisionModelWithProjection image encoder the IP-Adapter uses
(reference: modules/ip_adapter.py:78-81).

HF-CLIP-compatible numerics: pre-LN transformer, quick_gelu, causal mask for
text, eos-position pooling, optional clip-skip (hidden state K layers before
last, then final layer norm — diffusers encode_prompt convention).
Textual-inversion embeddings are extra rows appended to the token embedding
table (see weights/textual_inversion.py).
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    num_extra_embeddings: int = 0  # textual-inversion rows

    @staticmethod
    def from_json(cfg: dict, num_extra_embeddings: int = 0) -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=cfg.get("vocab_size", 49408),
            hidden_size=cfg.get("hidden_size", 768),
            num_layers=cfg.get("num_hidden_layers", 12),
            num_heads=cfg.get("num_attention_heads", 12),
            intermediate_size=cfg.get("intermediate_size", 3072),
            max_position_embeddings=cfg.get("max_position_embeddings", 77),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            eos_token_id=cfg.get("eos_token_id", 49407),
            num_extra_embeddings=num_extra_embeddings,
        )


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5

    @staticmethod
    def from_json(cfg: dict) -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            hidden_size=cfg.get("hidden_size", 1280),
            num_layers=cfg.get("num_hidden_layers", 32),
            num_heads=cfg.get("num_attention_heads", 16),
            intermediate_size=cfg.get("intermediate_size", 5120),
            image_size=cfg.get("image_size", 224),
            patch_size=cfg.get("patch_size", 14),
            projection_dim=cfg.get("projection_dim", 1024),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        )


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        q = nn.Dense(C, name="q_proj", dtype=self.dtype)(x)
        k = nn.Dense(C, name="k_proj", dtype=self.dtype)(x)
        v = nn.Dense(C, name="v_proj", dtype=self.dtype)(x)
        q = q.reshape(B, N, self.num_heads, head_dim)
        k = k.reshape(B, N, self.num_heads, head_dim)
        v = v.reshape(B, N, self.num_heads, head_dim)
        mask = None
        if causal:
            mask = jnp.tril(jnp.ones((N, N), bool))[None, None]
        out = dot_product_attention(q, k, v, mask=mask)
        return nn.Dense(C, name="out_proj", dtype=self.dtype)(out.reshape(B, N, C))


class CLIPLayer(nn.Module):
    num_heads: int
    intermediate_size: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool):
        h = nn.LayerNorm(epsilon=self.eps, name="layer_norm1", dtype=jnp.float32)(x)
        x = x + CLIPAttention(self.num_heads, name="self_attn", dtype=self.dtype)(h, causal)
        h = nn.LayerNorm(epsilon=self.eps, name="layer_norm2", dtype=jnp.float32)(x)
        h = nn.Dense(self.intermediate_size, name="mlp_fc1", dtype=self.dtype)(h)
        h = quick_gelu(h)
        h = nn.Dense(x.shape[-1], name="mlp_fc2", dtype=self.dtype)(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, clip_skip: int = 0):
        """input_ids: (B, 77) int32. Returns dict with last_hidden_state,
        pooled, and (clip-skipped) encoder_hidden_states for the UNet."""
        cfg = self.config
        embed = nn.Embed(
            cfg.vocab_size + cfg.num_extra_embeddings,
            cfg.hidden_size,
            name="token_embedding",
            dtype=self.dtype,
        )(input_ids)
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            name="position_embedding",
            dtype=self.dtype,
        )(jnp.arange(input_ids.shape[1])[None])
        x = embed + pos

        skipped = None
        for i in range(cfg.num_layers):
            x = CLIPLayer(
                cfg.num_heads,
                cfg.intermediate_size,
                cfg.layer_norm_eps,
                name=f"layers_{i}",
                dtype=self.dtype,
            )(x, causal=True)
            # clip_skip=K -> use hidden states K layers before the last
            if clip_skip > 0 and i == cfg.num_layers - 1 - clip_skip:
                skipped = x

        final_ln = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, name="final_layer_norm", dtype=jnp.float32
        )
        last = final_ln(x)
        encoder_states = final_ln(skipped) if skipped is not None else last

        eos_pos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1
        )
        pooled = jnp.take_along_axis(last, eos_pos[:, None, None], axis=1)[:, 0]
        return {
            "last_hidden_state": last,
            "encoder_hidden_states": encoder_states,
            "pooled_output": pooled,
        }


class CLIPVisionModelWithProjection(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        """pixel_values: (B, H, W, 3) CLIP-normalized. Returns image_embeds
        (projected), pooled, and penultimate hidden states (IP-Adapter Plus
        consumes hidden_states[-2], reference: modules/ip_adapter.py Plus
        variants / resampler path)."""
        cfg = self.config
        B = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size,
            use_bias=False,
            name="patch_embedding",
            dtype=self.dtype,
        )(pixel_values)
        patches = patches.reshape(B, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        cls = jnp.broadcast_to(cls.astype(patches.dtype), (B, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        n_pos = x.shape[1]
        pos = nn.Embed(n_pos, cfg.hidden_size, name="position_embedding", dtype=self.dtype)(
            jnp.arange(n_pos)[None]
        )
        x = x + pos
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="pre_layrnorm", dtype=jnp.float32)(x)

        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPLayer(
                cfg.num_heads,
                cfg.intermediate_size,
                cfg.layer_norm_eps,
                name=f"layers_{i}",
                dtype=self.dtype,
            )(x, causal=False)

        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, name="post_layernorm", dtype=jnp.float32
        )(x[:, 0])
        image_embeds = nn.Dense(
            cfg.projection_dim, use_bias=False, name="visual_projection", dtype=self.dtype
        )(pooled)
        return {
            "image_embeds": image_embeds,
            "pooled_output": pooled,
            "penultimate_hidden_states": penultimate,
        }
