"""AnimationEngine — the diffusion core as one jitted window program.

Functional re-design of the reference's ControlAnimationPipeline.__call__
(reference: animatediff/pipelines/controlanimation_pipeline.py:625-875):

  reference (torch, eager)                 this engine (JAX)
  ------------------------------------    ---------------------------------
  python for-loop over timesteps with     lax.scan over a step index with
  per-step empty_cache (:793-794)         table-driven schedulers
  CFG via torch.cat + chunk (:797,844)    CFG as a leading batch axis of the
                                          same scanned step
  ControlNet called per step on einops-   ControlNet residuals computed
  rearranged tensors (:810)               inside the scanned step, already
                                          in UNet layout
  VAE decode frame-at-a-time (:501-514)   batched jitted decode
  unseeded torch.randn inside LCM step    explicit jax.random key tree

Behavioral contract reproduced exactly (see prepare_latents below and the
scheduler modules): overlap/img2img noising (:549-613), CFG ordering
[uncond, cond] (:721-722), ControlNet CFG/guess/LCM input selection
(:811-813), LCM w-embedding (:477-498,768-771).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.controlnet import ControlNetModel, sum_controlnet_residuals
from ..models.unet3d import UNet3DConditionModel
from ..models.vae import AutoencoderKL
from ..schedulers import (
    DiffusionSchedule,
    Scheduler,
    batch_shared_normal,
    make_scheduler,
)


def get_w_embedding(w: jnp.ndarray, embedding_dim: int = 256) -> jnp.ndarray:
    """Sinusoidal guidance-scale embedding for LCM UNets
    (reference: controlanimation_pipeline.py:477-498)."""
    w = w * 1000.0
    half = embedding_dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = w.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


@dataclass
class EngineModels:
    """Module+params bundle the engine drives."""

    unet: UNet3DConditionModel
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    controlnets: Sequence[ControlNetModel] = ()
    controlnet_params: Sequence[Any] = ()
    cond_scales: Sequence[float] = ()


@dataclass(frozen=True)
class WindowStatic:
    """Static (compile-time) window configuration."""

    scheduler_name: str = "EulerDiscreteScheduler"
    steps: int = 30
    strength: float = 1.0
    guidance_scale: float = 7.5
    use_lcm: bool = False
    lcm_origin_steps: int = 50
    guess_mode: bool = False
    overlaps: int = 0
    use_img2img: bool = False
    has_input_frames: bool = False
    has_last_output_frames: bool = False
    ipa_scale: float = 1.0
    # trailing IP-Adapter image tokens appended to the text embeds; the UNet
    # consumes them via its dual-stream attn2, ControlNets must NOT see them
    ip_tokens: int = 0
    # window geometry for pure txt2vid (no input frames to infer from)
    frame_count: int = 16
    height: int = 512
    width: int = 512
    # quantize decoded frames to uint8 on device (4x smaller readback)
    output_uint8: bool = False
    # decode this many frames at a time (0 = whole window at once); bounds
    # VAE-decoder peak HBM so 32-frame windows fit a 16GB chip
    decode_chunk: int = 0
    # encoder propagation ("Faster Diffusion" arXiv:2312.09608, opt-in):
    # every Nth sampler step is a KEY step running the full UNet (and
    # ControlNets); the steps between reuse the key step's cached encoder
    # features (post-ControlNet-injection skips + mid) and run only the time
    # embedding + up blocks. Adjacent-step encoder features are nearly
    # identical at 20+ steps, so quality cost is small for ~35-45% less
    # denoise compute at N=2. 0/1 = off (the default program is unchanged).
    # Multi-step samplers only: LCM's 4 giant steps violate the
    # adjacent-step assumption (the engine raises).
    encoder_reuse_every: int = 0
    # overlap-latent reuse: when the window call provides `head_latents`
    # (clean latents of the first `overlaps` input frames, cached from the
    # previous window's encode of the SAME pixels) prepare encodes only the
    # novel frames; `tail_latents` > 0 makes prepare also return that many
    # clean tail latents for the next window's cache. Cuts the per-window
    # VAE encode by overlaps/frame_count. Deviation from the reference
    # (which re-encodes every frame with a per-window reseeded generator,
    # controlanimation_pipeline.py:565-588): the overlap frames keep the
    # posterior sample drawn when first encoded instead of a fresh draw —
    # same distribution, strictly more temporally consistent.
    tail_latents: int = 0

    @property
    def do_cfg(self) -> bool:
        return (self.guidance_scale > 1.0) and not self.use_lcm


class AnimationEngine:
    def __init__(self, models: EngineModels, schedule: DiffusionSchedule):
        self.m = models
        self.schedule = schedule
        self._window_cache: dict = {}

    # -- scheduler construction ---------------------------------------------
    def build_scheduler(self, st: WindowStatic) -> Scheduler:
        if st.use_lcm:
            return make_scheduler(
                "LCMScheduler",
                self.schedule,
                st.steps,
                strength=st.strength,
                lcm_origin_steps=st.lcm_origin_steps,
                strength_mode="origin",
            )
        kw = {}
        if st.scheduler_name == "LCMScheduler":
            # LCM-LoRA profile: diffusers LCM table + tail truncation
            # (reference :731-740 with the registry scheduler)
            kw = {"lcm_origin_steps": st.lcm_origin_steps, "strength_mode": "tail"}
        return make_scheduler(
            st.scheduler_name, self.schedule, st.steps, strength=st.strength, **kw
        )

    # -- VAE helpers ---------------------------------------------------------
    def _encode_frames(self, vae_params, frames: jnp.ndarray, key) -> jnp.ndarray:
        """(B, F, H, W, 3) in [-1,1] -> (B, F, h, w, 4) scaled latents,
        posterior-sampled (reference: prepare_latents :565-588).

        vae_params is an explicit argument: closing over it would bake the
        weights into the HLO as constants (oversized compile payloads on
        remote-compile TPU paths).

        uint8 input is accepted and normalized on device — callers transfer
        raw frames (4x less host->device traffic than f32)."""
        if frames.dtype == jnp.uint8:
            frames = frames.astype(jnp.float32) / 127.5 - 1.0
        # vmap over the batch axis with ONE key: every batch element
        # (segment / data-parallel window) samples the posterior with the
        # same noise a sequential same-seed run draws at (F, ...) — see
        # schedulers/base.py batch_shared_normal. XLA flattens the vmap
        # back into a (B*F)-batch conv, so the program is unchanged.
        def enc(fb):
            return self.m.vae.apply(
                {"params": vae_params}, fb, key, method=AutoencoderKL.encode
            )

        return jax.vmap(enc)(frames)

    def _decode_latents(
        self, vae_params, latents: jnp.ndarray, to_uint8: bool = False,
        chunk: int = 0,
    ) -> jnp.ndarray:
        """(B, F, h, w, 4) -> (B, F, H, W, 3) in [0,1] (or uint8 [0,255] when
        to_uint8 — quantization on device keeps the device->host readback at
        1/4 the bytes) (reference decode_latents :501-514, without the frame
        loop).

        chunk > 0 decodes `chunk` frames at a time via lax.map (one compiled
        body, sequential execution) — bounds decoder peak activations so
        32-frame windows fit v5e HBM; frames are independent, so numerics
        are unchanged."""
        B, F = latents.shape[:2]
        flat = latents.reshape(B * F, *latents.shape[2:])

        def dec(z):
            img = self.m.vae.apply({"params": vae_params}, z, method=AutoencoderKL.decode)
            img = (img / 2 + 0.5).clip(0.0, 1.0)
            if to_uint8:
                img = (img.astype(jnp.float32) * 255.0 + 0.5).astype(jnp.uint8)
            return img

        n = B * F
        if chunk and n > chunk and n % chunk == 0:
            groups = flat.reshape(n // chunk, chunk, *flat.shape[1:])
            img = jax.lax.map(dec, groups)
            img = img.reshape(n, *img.shape[2:])
        else:
            img = dec(flat)
        return img.reshape(B, F, *img.shape[1:])

    # -- latent preparation --------------------------------------------------
    def _prepare_latents(
        self,
        st: WindowStatic,
        sched: Scheduler,
        vae_params,
        key,
        latent_shape: tuple[int, ...],
        input_frames: Optional[jnp.ndarray],
        last_output_frames: Optional[jnp.ndarray],
        head_latents: Optional[jnp.ndarray] = None,
    ):
        """Reference prepare_latents (:549-613), vectorized over frames.

        Returns the noised latents; when st.tail_latents > 0 returns
        (noised_latents, clean_tail_latents) — see WindowStatic."""
        k_noise, k_in, k_out = jax.random.split(key, 3)
        # batch-shared draw: batch elements are independent same-seed videos
        # (segments / data-parallel windows) — each must see the noise a
        # sequential same-seed run would (schedulers/base.py docstring)
        noise = batch_shared_normal(k_noise, latent_shape, jnp.float32)

        # latent reuse is plumbed for the LCM window (the product profile,
        # where the input-frame encode is the whole prepare cost)
        assert not (st.tail_latents or head_latents is not None) or st.use_lcm

        def with_tail(noised, frames_latents):
            if not st.tail_latents:
                return noised
            assert frames_latents is not None
            return noised, frames_latents[:, -st.tail_latents:]

        needs_frames = st.overlaps > 0 or st.strength < 1.0 or st.use_lcm
        if not needs_frames:
            return noise * sched.init_noise_sigma

        if input_frames is None:
            frames_latents = None
        elif head_latents is not None:
            # overlap-latent reuse: the head frames' clean latents were
            # encoded last window (identical pixels); encode only the rest
            novel = self._encode_frames(
                vae_params, input_frames[:, head_latents.shape[1]:], k_in
            )
            frames_latents = jnp.concatenate(
                [head_latents.astype(novel.dtype), novel], axis=1
            )
        else:
            frames_latents = self._encode_frames(vae_params, input_frames, k_in)

        if st.use_lcm:
            # LCM noises the stacked input-frame latents only (reference
            # :591-593); last_output_frames never reach the latent path, so
            # skip their VAE encode entirely (~K frame encodes per window)
            if frames_latents is None:
                # txt2vid extension: the reference's LCM path cannot run
                # without input frames (`torch.stack([])` raises at :592).
                # First window: consistency-sample from pure noise. Overlap
                # windows: noise the last outputs' latents, anchor-padded
                # beyond the overlap — the reference's own txt2vid treatment
                # on the non-LCM path (:595-604).
                assert not st.tail_latents  # latent reuse needs input frames
                if last_output_frames is None:
                    return noise * sched.init_noise_sigma
                last_latents = self._encode_frames(
                    vae_params, last_output_frames, k_out
                )
                B, F = latent_shape[:2]
                K = last_latents.shape[1]
                anchor = last_latents[:, -1:]
                frames_latents = jnp.concatenate(
                    [last_latents,
                     jnp.broadcast_to(anchor, (B, F - K, *latent_shape[2:]))],
                    axis=1,
                )
            return with_tail(sched.add_noise(frames_latents, noise, 0), frames_latents)

        last_latents = (
            self._encode_frames(vae_params, last_output_frames, k_out)
            if last_output_frames is not None
            else None
        )

        if last_latents is not None and st.strength < 1.0:
            F = latent_shape[1]
            K = last_latents.shape[1]
            # per-frame-index source selection (reference :595-604)
            idx = jnp.arange(F)
            in_overlap = (idx < K)[None, :, None, None, None]
            anchor = last_latents[:, -1:]  # (B,1,h,w,4)
            if st.use_img2img and frames_latents is not None:
                tail_src = frames_latents
            else:
                tail_src = jnp.broadcast_to(anchor, latent_shape)
            K_pad = jnp.concatenate(
                [last_latents, jnp.broadcast_to(anchor, (latent_shape[0], F - K, *latent_shape[2:]))],
                axis=1,
            )
            source = jnp.where(in_overlap, K_pad, tail_src)
            return sched.add_noise(source, noise, 0)

        return noise * sched.init_noise_sigma

    # -- the jitted window programs -------------------------------------------
    #
    # The window is THREE jitted programs (prepare / denoise-scan / decode)
    # rather than one monolith: the encode and decode programs are reused
    # across window configs, and the per-program HLO stays within the size
    # limits of remote-compile TPU paths (the single-program form exceeded
    # the axon tunnel's compile-request cap).
    # Program caches are keyed on the WindowStatic fields each program
    # actually consumes — NOT the whole st — so window variants that differ
    # only in fields a program ignores (e.g. overlaps 0 vs 8 for denoise,
    # between the first and the steady-state window) share one compile.
    @staticmethod
    def _sched_key(st: WindowStatic) -> tuple:
        return (st.scheduler_name, st.steps, st.strength, st.use_lcm,
                st.lcm_origin_steps)

    def _make_prepare_fn(self, st: WindowStatic, sched) -> Callable:
        key_ = ("prep", self._sched_key(st), st.overlaps, st.use_img2img,
                st.tail_latents)
        if key_ in self._window_cache:
            return self._window_cache[key_]

        def prepare(vae_params, input_frames, last_output_frames, latent_shape,
                    key, head_latents=None):
            return self._prepare_latents(
                st, sched, vae_params, key, latent_shape, input_frames,
                last_output_frames, head_latents
            )

        fn = jax.jit(prepare, static_argnames=("latent_shape",))
        self._window_cache[key_] = fn
        return fn

    def _make_decode_fn(self, to_uint8: bool = False, chunk: int = 0) -> Callable:
        key_ = ("decode", to_uint8, chunk)
        if key_ in self._window_cache:
            return self._window_cache[key_]
        fn = jax.jit(lambda vp, lat: self._decode_latents(vp, lat, to_uint8, chunk))
        self._window_cache[key_] = fn
        return fn

    def _make_denoise_fn(self, st: WindowStatic, sched) -> Callable:
        key_ = ("denoise", self._sched_key(st), st.guidance_scale,
                st.guess_mode, st.ipa_scale, st.ip_tokens,
                st.encoder_reuse_every)
        if key_ in self._window_cache:
            return self._window_cache[key_]
        if st.encoder_reuse_every > 1 and st.use_lcm:
            raise ValueError(
                "encoder_reuse_every requires a multi-step sampler: LCM's "
                "few giant steps violate the adjacent-step encoder-feature "
                "approximation (arXiv:2312.09608); disable one of the two"
            )

        ts = jnp.asarray(np.round(sched.timesteps).astype(np.int64))
        n_cn = len(self.m.controlnets)

        def run(
            unet_params,
            cn_params: tuple,
            text_embeds: jnp.ndarray,  # (2B, L, D) if cfg else (B, L, D)
            cond_images: tuple,  # per net (B, F, Hpx, Wpx, 3)
            latents: jnp.ndarray,
            k_loop,
        ):
            B = latents.shape[0]

            # condition maps may arrive as uint8 (lean host->device transfer)
            cond_images = tuple(
                c.astype(jnp.float32) / 255.0 if c.dtype == jnp.uint8 else c
                for c in cond_images
            )

            # LCM guidance embedding (reference :768-771)
            w_emb = None
            if st.use_lcm:
                w_vec = jnp.full((B,), st.guidance_scale, jnp.float32)
                w_dim = self.m.unet.config.time_cond_proj_dim or 256
                w_emb = get_w_embedding(w_vec, w_dim)

            # text context for controlnets: cond-only when lcm/guess/no-cfg
            cn_uses_cond_only = st.use_lcm or st.guess_mode or not st.do_cfg
            if st.do_cfg:
                cond_half = text_embeds[B:]
            else:
                cond_half = text_embeds
            cn_text = cond_half if cn_uses_cond_only else text_embeds
            if st.ip_tokens:
                # ControlNets are text-only: strip the trailing IP image
                # tokens (reference CNAttnProcessor end_pos truncation,
                # modules/attention_processor.py:529-532, installed at
                # modules/ip_adapter.py:120-134)
                cn_text = cn_text[:, : cn_text.shape[1] - st.ip_tokens]

            cn_cond_images = cond_images
            if not cn_uses_cond_only and n_cn:
                # CFG duplication of condition images (reference
                # controlresiduals :268-269)
                cn_cond_images = tuple(jnp.concatenate([c, c]) for c in cond_images)

            state0 = sched.init_state(latents.shape)

            def cn_residuals(lat_in, lcm_in, t):
                down_res = mid_res = None
                if n_cn:
                    cn_input = lcm_in if cn_uses_cond_only else lat_in
                    per_net = []
                    for ci in range(n_cn):
                        d, m = self.m.controlnets[ci].apply(
                            {"params": cn_params[ci]},
                            cn_input,
                            t,
                            cn_text,
                            cn_cond_images[ci],
                            conditioning_scale=self.m.cond_scales[ci],
                            guess_mode=st.guess_mode,
                        )
                        per_net.append((d, m))
                    down_res, mid_res = sum_controlnet_residuals(per_net)
                    if cn_uses_cond_only and st.do_cfg:
                        # reference relies on B=1 torch broadcasting here —
                        # residuals apply to BOTH CFG branches; make explicit
                        down_res = [jnp.concatenate([d, d]) for d in down_res]
                        mid_res = jnp.concatenate([mid_res, mid_res])
                return down_res, mid_res

            def body(carry, i):
                latents, state = carry
                t = ts[i]

                if st.do_cfg:
                    lat_in = jnp.concatenate([latents, latents], axis=0)
                else:
                    lat_in = latents
                lat_in = sched.scale_model_input(i, lat_in)
                lcm_in = sched.scale_model_input(i, latents)

                down_res, mid_res = cn_residuals(lat_in, lcm_in, t)

                if st.use_lcm:
                    model_out = self.m.unet.apply(
                        {"params": unet_params},
                        lcm_in,
                        t,
                        text_embeds,
                        timestep_cond=w_emb,
                        down_block_additional_residuals=down_res,
                        mid_block_additional_residual=mid_res,
                        ip_scale=st.ipa_scale,
                    )
                else:
                    model_out = self.m.unet.apply(
                        {"params": unet_params},
                        lat_in,
                        t,
                        text_embeds,
                        down_block_additional_residuals=down_res,
                        mid_block_additional_residual=mid_res,
                        ip_scale=st.ipa_scale,
                    )
                    if st.do_cfg:
                        uncond, cond = jnp.split(model_out, 2, axis=0)
                        model_out = uncond + st.guidance_scale * (cond - uncond)

                model_out = model_out.astype(latents.dtype)
                latents, state = sched.step(
                    i, model_out, latents, state, jax.random.fold_in(k_loop, i)
                )
                return (latents, state), None

            # ---- encoder propagation (arXiv:2312.09608, opt-in) ----
            # key steps run the full graph and refresh the feature cache;
            # the steps between run decoder-only against it. The carry grows
            # by the cached (skips, mid) pytree; step 0 and the final step
            # are always keys. The default body above is untouched so the
            # compiled default program (and its cache entries) are identical
            # with the feature off.
            reuse_n = st.encoder_reuse_every
            if reuse_n > 1:
                keys_np = np.zeros(sched.num_steps, bool)
                keys_np[::reuse_n] = True
                keys_np[-1] = True  # spend full compute where it matters most
                key_mask = jnp.asarray(keys_np)

                def body_reuse(carry, i):
                    latents, state, cache = carry
                    t = ts[i]
                    if st.do_cfg:
                        lat_in = jnp.concatenate([latents, latents], axis=0)
                    else:
                        lat_in = latents
                    lat_in = sched.scale_model_input(i, lat_in)
                    lcm_in = sched.scale_model_input(i, latents)

                    def full_step(op):
                        lat_in, lcm_in, _ = op
                        down_res, mid_res = cn_residuals(lat_in, lcm_in, t)
                        return self.m.unet.apply(
                            {"params": unet_params},
                            lat_in,
                            t,
                            text_embeds,
                            down_block_additional_residuals=down_res,
                            mid_block_additional_residual=mid_res,
                            ip_scale=st.ipa_scale,
                            return_encoder_features=True,
                        )

                    def cached_step(op):
                        lat_in, _, cache = op
                        out, _ = self.m.unet.apply(
                            {"params": unet_params},
                            lat_in,
                            t,
                            text_embeds,
                            ip_scale=st.ipa_scale,
                            encoder_cache=cache,
                            return_encoder_features=True,
                        )
                        return out, cache

                    model_out, cache = jax.lax.cond(
                        key_mask[i], full_step, cached_step, (lat_in, lcm_in, cache)
                    )
                    if st.do_cfg:
                        uncond, cond = jnp.split(model_out, 2, axis=0)
                        model_out = uncond + st.guidance_scale * (cond - uncond)
                    model_out = model_out.astype(latents.dtype)
                    latents, state = sched.step(
                        i, model_out, latents, state, jax.random.fold_in(k_loop, i)
                    )
                    return (latents, state, cache), None

            # measured on v5e: unrolling the 4-step LCM loop is perf-neutral
            # (752 vs 748 ms) and costs compile time — keep the rolled scan
            #
            # 32-frame 512px windows need O(N)-memory attention: XLA's fused
            # form materializes the (B·F, H, N, N) logits (8.6GB — OOMs a
            # 16GB v5e). The guard is on B·F, not F alone: segment-parallel
            # runs (B = parallel_segments) hit the same wall at F=16, S>=2.
            # The force_flash context applies at trace time, so the Euler/CFG
            # 16-frame window (same attention SHAPE after CFG duplication,
            # but a window that measured as fitting) keeps XLA's
            # measured-faster form (B=1 there; CFG duplication is inside the
            # UNet call and is deliberately not counted).
            from ..ops import attention as attn_mod

            # bytes-based: B·F·heads·N²·2 (bf16 logits). 512px thresholds
            # unchanged (F=24 = 6.4GB fits and XLA measures faster, F=32 =
            # 8.6GB OOMs -> flash), and high-res windows (768px F=16 =
            # 21.7GB) now force flash too instead of OOMing
            n_tok = latents.shape[2] * latents.shape[3]
            logits_bytes = latents.shape[0] * latents.shape[1] * 8 * n_tok * n_tok * 2
            big_window = logits_bytes >= 7_000_000_000
            # only ENTER the context when forcing: force_flash(False) would
            # overwrite an outer force_flash(True) (e.g. a measurement
            # harness A/B-ing the kernels) for the whole scan trace
            import contextlib

            flash_ctx = (
                attn_mod.force_flash(True) if big_window
                else contextlib.nullcontext()
            )
            with flash_ctx:
                if reuse_n > 1:
                    # zero-init cache with the key-step feature shapes; the
                    # step-0 key refreshes it before any cached step reads it
                    lat0 = (
                        jnp.concatenate([latents, latents], axis=0)
                        if st.do_cfg else latents
                    )
                    lat0 = sched.scale_model_input(0, lat0)
                    feats_sd = jax.eval_shape(
                        lambda p, l, te: self.m.unet.apply(
                            {"params": p}, l, ts[0], te, ip_scale=st.ipa_scale,
                            return_encoder_features=True,
                        )[1],
                        unet_params, lat0, text_embeds,
                    )
                    cache0 = jax.tree_util.tree_map(
                        lambda s: jnp.zeros(s.shape, s.dtype), feats_sd
                    )
                    (latents, _, _), _ = jax.lax.scan(
                        body_reuse, (latents, state0, cache0),
                        jnp.arange(sched.num_steps),
                    )
                else:
                    (latents, _), _ = jax.lax.scan(
                        body, (latents, state0), jnp.arange(sched.num_steps)
                    )
            return latents

        jitted = jax.jit(run)
        self._window_cache[key_] = jitted
        return jitted

    def make_window_fn(self, st: WindowStatic) -> Callable:
        """Compose the three cached programs into the window function."""
        key_ = ("window", st)
        if key_ in self._window_cache:
            return self._window_cache[key_]
        sched = self.build_scheduler(st)
        if sched.num_steps == 0:
            raise ValueError(
                f"steps*strength truncated to zero denoise steps "
                f"(steps={st.steps}, strength={st.strength}); raise either value"
            )
        prepare = self._make_prepare_fn(st, sched)
        denoise = self._make_denoise_fn(st, sched)
        decode = self._make_decode_fn(st.output_uint8, st.decode_chunk)

        def run(unet_params, cn_params, text_embeds, cond_images,
                input_frames, last_output_frames, key, head_latents=None):
            k_prep, k_loop = jax.random.split(key)
            B = text_embeds.shape[0] // 2 if st.do_cfg else text_embeds.shape[0]
            if input_frames is not None:
                F, H, W = input_frames.shape[1:4]
            else:
                F, H, W = st.frame_count, st.height, st.width
            latent_shape = (B, F, H // 8, W // 8, 4)
            latents = prepare(
                self.m.vae_params, input_frames, last_output_frames, latent_shape,
                k_prep, head_latents
            )
            tail = None
            if st.tail_latents:
                latents, tail = latents
            latents = denoise(
                unet_params, cn_params, text_embeds, cond_images, latents, k_loop
            )
            out = decode(self.m.vae_params, latents)
            return (out, tail) if st.tail_latents else out

        self._window_cache[key_] = run
        return run

    def generate_window(
        self,
        st: WindowStatic,
        text_embeds: jnp.ndarray,
        key,
        cond_images: Sequence[jnp.ndarray] = (),
        input_frames: Optional[jnp.ndarray] = None,
        last_output_frames: Optional[jnp.ndarray] = None,
        head_latents: Optional[jnp.ndarray] = None,
    ):
        """Run one window; returns (B, F, H, W, 3) float frames in [0,1]
        (plus the clean tail latents when st.tail_latents > 0)."""
        fn = self.make_window_fn(st)
        return fn(
            self.m.unet_params,
            tuple(self.m.controlnet_params),
            text_embeds,
            tuple(cond_images),
            input_frames,
            last_output_frames,
            key,
            head_latents,
        )
