"""ControlAnimatePipeline — model assembly + per-window animate() facade.

Capability parity with the reference facade
(reference: modules/controlanimate_pipeline.py): builds
tokenizer / CLIP text / VAE / UNet3D / ControlNets / IP-Adapter from a
RunConfig, applies the weight matrix (motion module, DreamBooth, LoRA,
LCM-LoRA, TI), runs Compel-style prompt weighting, and exposes
`animate(input_frames, last_output_frames, ...)`.

Unlike the reference, model state is immutable after construction (no
.half()/.to('cuda') mutation, no attn-processor swapping) and all device
work happens inside the AnimationEngine's jitted window programs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace as _dc_replace
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ArchConfig, RunConfig
from ..models.clip import CLIPTextConfig, CLIPTextModel
from ..models.controlnet import ControlNetModel
from ..models.tokenizer import CLIPTokenizer
from ..models.unet3d import UNet3DConditionModel, UNet3DConfig
from ..models.vae import AutoencoderKL
from ..schedulers import make_schedule
from ..weights import ingest
from ..weights.clip_weights import text_params_from_torch
from ..weights.controlnet_weights import controlnet_params_from_torch
from ..weights.ldm_conversion import split_ldm_checkpoint
from ..weights.lora import fuse_lora, split_lora_by_component
from ..weights.textual_inversion import register_textual_inversions
from ..weights.unet_weights import unet_params_from_torch
from ..weights.vae_weights import vae_params_from_torch
from .engine import AnimationEngine, EngineModels, WindowStatic
from .prompt_weighting import encode_weighted_prompt


@dataclass
class TextStack:
    tokenizer: CLIPTokenizer
    model: CLIPTextModel
    params: Any

    def _jitted(self, clip_skip: int):
        # one jitted program per clip_skip (params as an argument, not a
        # closure — remote-compile request-size cap); eager per-op dispatch
        # of the 12-layer tower costs hundreds of tunnel round trips
        cache = self.__dict__.setdefault("_jit_cache", {})
        if clip_skip not in cache:
            cache[clip_skip] = jax.jit(
                lambda p, ids: self.model.apply(
                    {"params": p}, ids, clip_skip=clip_skip
                )["encoder_hidden_states"]
            )
        return cache[clip_skip]

    def encode(self, prompt: str, clip_skip: int = 0) -> jnp.ndarray:
        fn = self._jitted(clip_skip)

        def encode_fn(ids):
            return fn(self.params, ids)

        return encode_weighted_prompt(self.tokenizer, encode_fn, prompt)


class ControlAnimatePipeline:
    """Build once per run config; drive per window via animate()."""

    def __init__(
        self,
        config: RunConfig,
        *,
        models: Optional[EngineModels] = None,
        text_stack: Optional[TextStack] = None,
        ip_adapter: Optional[Any] = None,
        dtype: Optional[jnp.dtype] = None,
    ):
        self.config = config
        self.arch = (
            ArchConfig.from_yaml(config.inference_config_path)
            if Path(config.inference_config_path).exists()
            else ArchConfig()
        )
        if config.token_merge_ratio and not 0.0 < float(config.token_merge_ratio) < 1.0:
            raise ValueError(
                f"token_merge_ratio={config.token_merge_ratio} out of range "
                "(0, 1); it is the fraction of spatial tokens merged before "
                "self-attention (ops/token_merge.py)"
            )
        if config.temporal_band:
            # runtime opt-in (RunConfig.temporal_band) overrides the arch
            # yaml's band: banded temporal attention is a run-level speed
            # knob, not a property of the pretrained motion module
            self.arch = _dc_replace(
                self.arch,
                motion_module=_dc_replace(
                    self.arch.motion_module, attention_band=int(config.temporal_band)
                ),
            )
        # execution dtype comes from RunConfig (the TPU analog of the
        # reference's .half() policy, modules/controlanimate_pipeline.py:108-110);
        # float16 maps to bfloat16 — fp16 has no TPU fast path
        if dtype is None:
            dtype = {
                "float32": jnp.float32, "fp32": jnp.float32,
                "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                "float16": jnp.bfloat16, "fp16": jnp.bfloat16,
            }.get(str(config.dtype).lower())
            if dtype is None:
                raise ValueError(f"unknown RunConfig.dtype {config.dtype!r}")
        self.dtype = dtype
        # attention backend policy (the env var, when set, wins for ad-hoc
        # experiments; otherwise the config decides)
        if "CONTROLANIMATE_PALLAS_ATTENTION" not in os.environ:
            from ..ops.attention import set_pallas_enabled

            set_pallas_enabled(config.use_pallas_attention)
        if "CONTROLANIMATE_PALLAS_CONV" not in os.environ:
            from ..ops.conv_kernel import set_conv_kernel_enabled

            set_conv_kernel_enabled(config.use_pallas_conv)
        self.ip_adapter = ip_adapter
        # build the adapter BEFORE the UNet: the checkpoint layout decides
        # num_tokens (base=4, plus=16, full=257) and the UNet's dual-stream
        # attn2 width must match (reference: ip_adapter.py:288-482 variants)
        built_adapter = False
        if config.use_ipadapter and self.ip_adapter is None:
            from .ip_adapter import IPAdapter

            self.ip_adapter = IPAdapter.from_config(config)
            built_adapter = True
            if self.ip_adapter.variant in ("xl", "plus-xl"):
                # SDXL-family checkpoints project to 2048-dim context tokens;
                # the SD1.5 UNet's 768-dim cross-attention cannot consume
                # them. The reference's XL classes are likewise unused by its
                # shipped pipelines (modules/ip_adapter.py:288-482, no call
                # sites) — raise instead of silently mis-shaping.
                raise NotImplementedError(
                    f"IP-Adapter checkpoint {config.ipadapter_ckpt_path} is "
                    f"the SDXL-family '{self.ip_adapter.variant}' variant; "
                    "driving it requires an SDXL UNet, which is outside the "
                    "SD1.5 product path. Use an sd15 adapter checkpoint "
                    "(base/plus/full), or use IPAdapter.build_projection "
                    "directly for standalone XL token projection."
                )
        if models is not None and text_stack is not None:
            self.models = models
            self.text = text_stack
            got = models.unet.config.motion.attention_band
            if config.temporal_band and got != int(config.temporal_band):
                # the band is baked into the UNet's traced program; a silent
                # mismatch would no-op the run-level knob
                raise ValueError(
                    f"RunConfig.temporal_band={config.temporal_band} but the "
                    f"provided UNet was built with attention_band={got}; "
                    "construct the UNet with the matching "
                    "MotionModuleConfig.attention_band (disk builds do this "
                    "automatically)"
                )
            got_tr = float(models.unet.config.token_merge_ratio)
            if bool(config.token_merge_motion) != bool(
                models.unet.config.token_merge_motion
            ):
                raise ValueError(
                    f"RunConfig.token_merge_motion={config.token_merge_motion} "
                    "but the provided UNet was built with "
                    f"token_merge_motion={models.unet.config.token_merge_motion}; "
                    "bake the flag into UNet3DConfig (disk builds do this "
                    "automatically)"
                )
            if float(config.token_merge_ratio) != got_tr:
                # same bake-at-construction contract as temporal_band
                raise ValueError(
                    f"RunConfig.token_merge_ratio={config.token_merge_ratio} "
                    f"but the provided UNet was built with "
                    f"token_merge_ratio={got_tr}; construct the UNet with the "
                    "matching UNet3DConfig.token_merge_ratio (disk builds do "
                    "this automatically)"
                )
        else:
            self._build_from_disk()
        schedule = make_schedule(
            beta_start=self.arch.beta_start,
            beta_end=self.arch.beta_end,
            beta_schedule=self.arch.beta_schedule,
            num_train_timesteps=self.arch.num_train_timesteps,
        )
        self.engine = AnimationEngine(self.models, schedule)
        self._prompt_cache: dict = {}
        self._cn_dump_root: Optional[Path] = None
        # (expected_epoch, clean tail latents) from the previous window —
        # see RunConfig.reuse_overlap_latents
        self._overlap_latent_cache: Optional[tuple] = None

        if built_adapter:
            # write the checkpoint's to_k_ip/to_v_ip into every cross-attn
            # (reference does this with a regex index remap,
            # ip_adapter.py:136-185; here addressing is structural).
            # Injection runs BEFORE mesh sharding / device commit so the
            # injected leaves get the same placement as the rest of the tree.
            self.models.unet_params = self.ip_adapter.inject_into_unet_params(
                self.models.unet_params, self.models.unet.config
            )

        # optional multi-chip mesh (new vs reference's hardcoded single GPU):
        # params replicate, video tensors shard data x context (SURVEY §5.8)
        self.mesh = None
        if config.mesh_shape:
            from ..parallel.mesh import make_mesh, shard_params

            # cast to the run dtype BEFORE sharding: shard_params returns
            # committed jax.Arrays, which _commit_params passes through
            # untouched — without this host-side cast, multi-chip runs would
            # silently keep f32 weights (2x HBM residency + weight-read
            # bandwidth per chip) while single-chip runs get the run dtype
            self.mesh = make_mesh(tuple(config.mesh_shape), tuple(config.mesh_axes))
            cast = self._cast_tree_host
            self.models.unet_params = shard_params(self.mesh, cast(self.models.unet_params))
            self.models.vae_params = shard_params(self.mesh, cast(self.models.vae_params))
            self.models.controlnet_params = [
                shard_params(self.mesh, cast(p)) for p in self.models.controlnet_params
            ]

        # Commit every param tree to device ONCE. The disk loaders
        # (weights/*.py) return host numpy trees; the engine deliberately
        # passes params as call arguments (remote-compile payload cap — see
        # engine.py), so without an explicit device_put each window call
        # would re-transfer the full model host->device (~5.6GB f32 over the
        # axon tunnel ≈ minutes PER WINDOW — measured, r3). Float leaves are
        # cast to the run dtype first (the TPU analog of the reference's
        # .half() upload policy, modules/controlanimate_pipeline.py:108-110):
        # matmuls read them in compute dtype anyway, and the cast halves both
        # the one-time upload and HBM residency.
        self._commit_params()

    def _cast_tree_host(self, tree):
        """Cast host float leaves to the run dtype (leaves already committed
        to device — e.g. engine-built test fixtures — pass through)."""
        dtype = self.dtype
        if dtype == jnp.float32:
            return tree

        def cast_leaf(x):
            if isinstance(x, jax.Array):
                return x
            a = np.asarray(x)
            if a.dtype in (np.float32, np.float64):
                a = a.astype(dtype)
            return a

        return jax.tree_util.tree_map(cast_leaf, tree)

    @staticmethod
    def _pick_decode_chunk(total_frames: int, pixels: int) -> int:
        """Chunk size for the VAE decode: 0 (one shot) while the total frame
        count fits v5e HBM, else the largest divisor of the total <= 24."""
        if total_frames < 32 or pixels < 512 * 512:
            return 0
        return next(c for c in range(min(24, total_frames), 0, -1)
                    if total_frames % c == 0)

    # ---------------------------------------------------------- param commit
    def _commit_params(self):
        """device_put every model param tree exactly once (float leaves cast
        to the run dtype). Leaves that are already jax Arrays — mesh-sharded
        trees, or engine-built test fixtures — pass through untouched."""
        dtype = self.dtype

        def put_leaf(x):
            if isinstance(x, jax.Array):
                return x
            a = np.asarray(x)
            if a.dtype in (np.float32, np.float64) and dtype != jnp.float32:
                a = a.astype(dtype)
            return jax.device_put(a)

        def put(tree):
            return jax.tree_util.tree_map(put_leaf, tree)

        m = self.models
        m.unet_params = put(m.unet_params)
        m.vae_params = put(m.vae_params)
        m.controlnet_params = [put(p) for p in m.controlnet_params]
        self.text.params = put(self.text.params)
        if self.ip_adapter is not None:
            if getattr(self.ip_adapter, "vision_params", None) is not None:
                self.ip_adapter.vision_params = put(self.ip_adapter.vision_params)
            if getattr(self.ip_adapter, "proj_params", None) is not None:
                self.ip_adapter.proj_params = put(self.ip_adapter.proj_params)

    # ------------------------------------------------------------------ build
    def _build_from_disk(self):
        cfg = self.config
        base = Path(cfg.pretrained_lcm_model_path if cfg.use_lcm else cfg.pretrained_model_path)
        if not base.exists():
            raise FileNotFoundError(
                f"model path {base} not found; pass models=/text_stack= for "
                "weight-free construction"
            )

        # DreamBooth single-file overrides (reference: util.py:123-141)
        db_sds = None
        if cfg.dreambooth_path and Path(cfg.dreambooth_path).exists() and not cfg.use_lcm:
            db_sds = split_ldm_checkpoint(ingest.load_state_dict(cfg.dreambooth_path))

        # tokenizer + text encoder
        tokenizer = CLIPTokenizer.from_pretrained(base / "tokenizer")
        extra = register_textual_inversions(
            tokenizer, [p for p in cfg.textual_inversion_paths]
        )
        te_cfg_json, te_sd = ingest.load_hf_component(base, "text_encoder")
        if db_sds and db_sds["clip"]:
            te_sd = db_sds["clip"]
        tcfg = CLIPTextConfig.from_json(
            te_cfg_json, num_extra_embeddings=0 if extra is None else len(extra)
        )
        text_model = CLIPTextModel(tcfg, dtype=self.dtype)
        text_params = text_params_from_torch(te_sd, tcfg.num_layers, extra_embeddings=extra)

        # VAE (snapshot | single file | DreamBooth)
        if cfg.vae_path and Path(cfg.vae_path).exists():
            from ..weights.ldm_conversion import convert_ldm_vae

            vae_sd = convert_ldm_vae(ingest.load_state_dict(cfg.vae_path))
            vae_json: dict = {}
        elif db_sds and db_sds["vae"]:
            vae_sd, vae_json = db_sds["vae"], {}
        else:
            vae_json, vae_sd = ingest.load_hf_component(base, "vae")
        vae = AutoencoderKL(
            block_out_channels=tuple(vae_json.get("block_out_channels", (128, 256, 512, 512))),
            scaling_factor=vae_json.get("scaling_factor", 0.18215),
            groups=vae_json.get("norm_num_groups", 32),
            dtype=self.dtype,
        )
        vae_params = vae_params_from_torch(vae_sd, vae.block_out_channels)

        # UNet3D (2D base or DreamBooth + motion module overlay)
        unet_json, unet_sd = ingest.load_hf_component(base, "unet")
        if db_sds and db_sds["unet"]:
            unet_sd = db_sds["unet"]

        # LoRA fusing (reference: util.py:143-156; skipped under native LCM,
        # controlanimate_pipeline.py:88-106)
        lora_paths = () if cfg.use_lcm else cfg.lora_model_paths
        for lp, lw in zip(lora_paths, cfg.lora_weights or [1.0] * len(lora_paths)):
            if not Path(lp).exists():
                continue
            parts = split_lora_by_component(ingest.load_state_dict(lp))
            unet_sd, n_u = fuse_lora(unet_sd, parts["unet"], scale=float(lw))
            if parts["text_encoder"]:
                te_sd, n_t = fuse_lora(te_sd, parts["text_encoder"], scale=float(lw))
                text_params = text_params_from_torch(
                    te_sd, tcfg.num_layers, extra_embeddings=extra
                )

        # motion module loads in BOTH modes (reference loads it for LCM too,
        # controlanimate_pipeline.py:100-106)
        motion_sd = None
        if cfg.motion_module and Path(cfg.motion_module).exists():
            motion_sd = ingest.load_state_dict(cfg.motion_module)
            # motion-LoRA merge (reference: util.py:165-173)
            for mp, ma in zip(cfg.motion_lora_paths, cfg.motion_lora_alphas or [1.0] * len(cfg.motion_lora_paths)):
                if Path(mp).exists():
                    motion_sd, _ = fuse_lora(
                        motion_sd, ingest.load_state_dict(mp), scale=float(ma)
                    )

        ip_tokens = self.ip_adapter.num_tokens if self.ip_adapter is not None else 0
        # LCM uses the same inflated architecture + motion modules; only the
        # base 2D weights come from the LCM snapshot (reference:
        # controlanimate_pipeline.py:44-45 passes unet_additional_kwargs in
        # both branches)
        ucfg = UNet3DConfig.from_arch(self.arch, unet_json, ip_tokens=ip_tokens)
        if cfg.token_merge_ratio:
            # run-level speed knob like temporal_band: baked into the traced
            # program, not a property of the pretrained weights (range
            # validated in __init__)
            ucfg = _dc_replace(
                ucfg,
                token_merge_ratio=float(cfg.token_merge_ratio),
                token_merge_motion=bool(cfg.token_merge_motion),
                token_merge_min_tokens=int(cfg.token_merge_min_tokens),
            )
        unet = UNet3DConditionModel(ucfg, dtype=self.dtype)
        init_params = self._init_unet_params(unet, ucfg)
        unet_params, missing = unet_params_from_torch(
            unet_sd, ucfg, motion_sd=motion_sd, init_params=init_params, strict_2d=True
        )

        # ControlNets
        cns, cn_params = [], []
        if not cfg.use_lcm or cfg.controlnets:
            for name in cfg.controlnets:
                path = Path("models/ControlNet") / name.split("/")[-1]
                if not path.exists():
                    path = Path(name)
                cn_json, cn_sd = ingest.load_hf_component(path, "")
                cn_cfg = UNet3DConfig(
                    **{**UNet3DConfig().__dict__, "use_motion_module": False}
                )
                cns.append(ControlNetModel(cn_cfg, dtype=self.dtype))
                cn_params.append(controlnet_params_from_torch(cn_sd, cn_cfg))

        self.models = EngineModels(
            unet=unet,
            unet_params=unet_params,
            vae=vae,
            vae_params=vae_params,
            controlnets=cns,
            controlnet_params=cn_params,
            cond_scales=list(cfg.cond_scale) or [1.0] * len(cns),
        )
        self.text = TextStack(tokenizer, text_model, text_params)

    @staticmethod
    def _init_unet_params(unet: UNet3DConditionModel, ucfg: UNet3DConfig):
        x = jnp.zeros((1, 2, 8, 8, ucfg.in_channels))
        ctx = jnp.zeros((1, 7, ucfg.cross_attention_dim))
        kw = {}
        if ucfg.time_cond_proj_dim:
            kw["timestep_cond"] = jnp.zeros((1, ucfg.time_cond_proj_dim))
        return unet.init(jax.random.PRNGKey(0), x, jnp.asarray([1]), ctx, **kw)["params"]

    # ------------------------------------------------------------ debug dumps
    def _dump_condition_maps(self, net_name: str, maps: np.ndarray, epoch: int) -> None:
        """Per-epoch annotator-output dumps, the reference's main debugging
        artifact (reference: modules/controlresiduals_pipeline.py:239,249-259
        saves each condition map under controlnet_outputs_<ts>/<net>/)."""
        import time as _time

        from PIL import Image

        if self._cn_dump_root is None:
            self._cn_dump_root = (
                Path(self.config.output_video_dir)
                / f"controlnet_outputs_{_time.strftime('%Y%m%d-%H%M%S')}"
            )
        d = self._cn_dump_root / net_name.split("/")[-1]
        d.mkdir(parents=True, exist_ok=True)
        for i, m in enumerate(np.asarray(maps)):
            Image.fromarray((m * 255.0 + 0.5).astype(np.uint8)).save(
                d / f"{epoch:04d}_{i:02d}.png"
            )

    # --------------------------------------------------------------- prompts
    def _encode_prompts(self, prompt: str, n_prompt: str, clip_skip: int = 0):
        key = (prompt, n_prompt, clip_skip)
        if key not in self._prompt_cache:
            pos = self.text.encode(prompt, clip_skip)
            neg = self.text.encode(n_prompt, clip_skip)
            # a `.and()` conjunction makes one side longer than the other;
            # CFG stacks [neg, pos] on the batch axis, so pad the shorter
            # side by repeating its final token embedding (Compel's
            # pad-to-same-length behavior)
            if pos.shape[1] != neg.shape[1]:
                L = max(pos.shape[1], neg.shape[1])

                def pad(e):
                    if e.shape[1] == L:
                        return e
                    tail = jnp.repeat(e[:, -1:], L - e.shape[1], axis=1)
                    return jnp.concatenate([e, tail], axis=1)

                pos, neg = pad(pos), pad(neg)
            self._prompt_cache[key] = (pos, neg)
        return self._prompt_cache[key]

    # ----------------------------------------------------- condition staging
    def prepare_cond_images(
        self, input_frames: Optional[np.ndarray], epoch: int = 0
    ) -> list:
        """Annotate + stage ControlNet condition maps for a window.

        Pure host+transfer work, exposed separately so the orchestrator can
        run it for window N+1 while window N occupies the device
        (SURVEY §7 hard-part 6; the reference does this serially inside the
        window call, controlresiduals_pipeline.py:226-273).

        input_frames may be (F, H, W, 3) — one window, staged as batch 1 —
        or (S, F, H, W, 3) for the segment-parallel path (annotators run per
        frame over the flattened S·F stack; maps keep the segment axis)."""
        cfg = self.config
        cond_images = []
        if self.models.controlnets and input_frames is not None:
            from ..models.annotators import annotate_frames

            frames = np.asarray(input_frames)
            batched = frames.ndim == 5
            flat = frames.reshape(-1, *frames.shape[-3:]) if batched else frames
            for name in cfg.controlnets:
                maps = annotate_frames(name, flat)  # (N, H, W, 3) [0,1]
                if cfg.save_frames:
                    self._dump_condition_maps(name, maps, epoch)
                # quantize to uint8 for transfer (the reference feeds
                # uint8-derived PIL maps anyway); normalized on device
                maps_u8 = (np.asarray(maps) * 255.0 + 0.5).astype(np.uint8)
                if batched:
                    maps_u8 = maps_u8.reshape(*frames.shape[:2], *maps_u8.shape[1:])
                    cond_images.append(jnp.asarray(maps_u8))
                else:
                    cond_images.append(jnp.asarray(maps_u8)[None])
        return cond_images

    # --------------------------------------------------------------- animate
    def _reuse_overlap(self, has_input_frames: bool) -> bool:
        """Whether overlap-latent reuse is active for a window with/without
        input frames (see WindowStatic.tail_latents)."""
        cfg = self.config
        return (
            cfg.use_lcm
            and cfg.reuse_overlap_latents
            and self.mesh is None
            and not cfg.loop_back_frames
            and has_input_frames
        )

    def window_static(
        self,
        *,
        overlaps: int = 0,
        strength: Optional[float] = None,
        has_input_frames: bool = True,
        has_last_output_frames: bool = False,
        frame_count: Optional[int] = None,
        segments: int = 0,
        window_frames: Optional[int] = None,
    ) -> WindowStatic:
        """The exact compile-time window key animate_async builds for these
        call conditions — exposed so measurement tooling (bench.py MFU
        lines, scripts/tpu_perf.py) can address the engine's
        ALREADY-COMPILED programs; a guessed-at key that mismatches any
        field silently triggers a fresh multi-minute remote compile."""
        cfg = self.config
        strength = cfg.strength if strength is None else strength
        S = max(int(segments), 0)
        if window_frames is None:
            window_frames = frame_count or cfg.frame_count
        reuse = self._reuse_overlap(has_input_frames)
        return WindowStatic(
            scheduler_name=cfg.scheduler,
            steps=cfg.steps,
            strength=float(strength),
            guidance_scale=float(cfg.guidance_scale),
            use_lcm=cfg.use_lcm,
            lcm_origin_steps=cfg.lcm_origin_steps,
            guess_mode=cfg.guess_mode,
            encoder_reuse_every=int(cfg.encoder_reuse_every),
            overlaps=int(overlaps),
            use_img2img=cfg.use_img2img,
            has_input_frames=has_input_frames,
            has_last_output_frames=has_last_output_frames,
            ipa_scale=float(cfg.ipa_scale),
            ip_tokens=self.ip_adapter.num_tokens if self.ip_adapter is not None else 0,
            frame_count=frame_count or cfg.frame_count,
            height=cfg.height,
            width=cfg.width,
            output_uint8=True,
            # >=32 decoded frames overflow v5e HBM in the whole-window
            # decoder; chunked decode (frames are independent) bounds the
            # peak. The budget counts the TOTAL B*F frames (segment-parallel
            # runs decode S windows at once), and the chunk must divide it
            # (engine._decode_latents falls back to one shot otherwise) —
            # largest divisor <=24 (a 24-frame 512px decode is measured fine)
            decode_chunk=self._pick_decode_chunk(
                window_frames * max(S, 1), cfg.height * cfg.width
            ),
            tail_latents=cfg.overlap_length if reuse else 0,
        )

    def animate(
        self,
        input_frames: Optional[np.ndarray],
        last_output_frames: Optional[np.ndarray],
        **kw,
    ) -> np.ndarray:
        """Generate one window; returns (F, H, W, 3) uint8 HOST frames
        (blocking readback). See animate_async for the pipelined form."""
        return np.asarray(self.animate_async(input_frames, last_output_frames, **kw))

    def animate_async(
        self,
        input_frames: Optional[np.ndarray],  # (F, H, W, 3) uint8, device ok
        last_output_frames: Optional[np.ndarray],  # (K, H, W, 3) uint8 or None
        *,
        overlaps: int = 0,
        strength: Optional[float] = None,
        seed: int = 0,
        epoch: int = 0,
        frame_count: Optional[int] = None,
        cond_images: Optional[list] = None,  # pre-staged by prepare_cond_images
        segments: int = 0,
    ) -> jnp.ndarray:
        """Generate one window; returns the (F, H, W, 3) uint8 frames as a
        DEVICE array without forcing a host readback — callers can overlap
        the device->host fetch of window N with window N+1's compute
        (SURVEY §7 hard-part 6; the reference blocks on a full PIL round
        trip per window).

        Mirrors reference ControlAnimatePipeline.animate
        (modules/controlanimate_pipeline.py:124-169) + the engine __call__.

        segments > 1 runs S independent video segments LOCKSTEP as one
        batched window (SURVEY §2.13 data-parallel plan): input_frames is
        (S, F, H, W, 3), last_output_frames (S, K, H, W, 3), and the return
        keeps the segment axis — (S, F, H, W, 3) uint8. The batch axis
        shards over the mesh's `data` axis when a mesh is configured.
        """
        cfg = self.config
        strength = cfg.strength if strength is None else strength
        S = max(int(segments), 0)
        batched = S > 1

        pos, neg = self._encode_prompts(cfg.prompt, cfg.n_prompt, cfg.clip_skip)
        if batched:
            # one shared prompt, tiled per segment (per-segment IP anchors
            # attach below, so tiling must happen before the token concat)
            pos = jnp.broadcast_to(pos, (S, *pos.shape[1:]))
            neg = jnp.broadcast_to(neg, (S, *neg.shape[1:]))

        if input_frames is None:
            window_frames = frame_count or cfg.frame_count
        elif getattr(input_frames, "ndim", 0) == 5:
            window_frames = input_frames.shape[1]
        else:
            window_frames = len(input_frames)

        # IP-Adapter image tokens appended on the sequence axis
        # (reference: controlanimation_pipeline.py:698-710)
        if self.ip_adapter is not None:
            if last_output_frames is not None and len(last_output_frames):
                if batched:
                    # per-segment anchor frame (reference anchors on
                    # last_output_frames[0], vid2vid.py:199-212); slice on
                    # device BEFORE the host fetch (the CLIP cv2 resize needs
                    # host pixels, but only S frames — not the (S, K, H, W, 3)
                    # stack), then ONE batched vision-tower dispatch
                    anchors = np.asarray(last_output_frames[:, 0])
                    img_e, img_u = self.ip_adapter.embed_images(anchors)
                else:
                    img_e, img_u = self.ip_adapter.embed_image(last_output_frames[0])
            else:
                zshape = (S if batched else 1, self.ip_adapter.num_tokens, pos.shape[-1])
                img_e = img_u = jnp.zeros(zshape)
            pos = jnp.concatenate([pos, img_e], axis=1)
            neg = jnp.concatenate([neg, img_u], axis=1)

        # overlap-latent reuse (LCM product path, single device): the head
        # input frames of this window are the previous window's tail pixels,
        # whose clean latents were cached by the previous prepare
        reuse = self._reuse_overlap(input_frames is not None)
        head_latents = None
        if reuse and overlaps and self._overlap_latent_cache is not None:
            cache_epoch, cached_tail = self._overlap_latent_cache
            if (
                cache_epoch == epoch
                and cached_tail.shape[1] == overlaps
                and cached_tail.shape[0] == (S if batched else 1)
            ):
                head_latents = cached_tail

        st = self.window_static(
            overlaps=overlaps,
            strength=strength,
            has_input_frames=input_frames is not None,
            has_last_output_frames=last_output_frames is not None,
            frame_count=frame_count,
            segments=S,
            window_frames=window_frames,
        )

        do_cfg = st.do_cfg
        text_embeds = jnp.concatenate([neg, pos], axis=0) if do_cfg else pos

        # condition images per ControlNet (host annotators, batched), unless
        # the orchestrator pre-staged them during the previous window
        if cond_images is None:
            cond_images = self.prepare_cond_images(input_frames, epoch)

        def to_device(frames):
            # raw uint8 across the host->device boundary (4x less traffic);
            # the engine normalizes to [-1,1] on device. Already-staged
            # device arrays pass through (double-buffered callers); 5-dim
            # input already carries the batch/segment axis.
            if frames is None:
                return None
            if isinstance(frames, jnp.ndarray):
                return frames if frames.ndim == 5 else frames[None]
            arr = np.asarray(frames, np.uint8)
            return jnp.asarray(arr) if arr.ndim == 5 else jnp.asarray(arr)[None]

        input_dev = to_device(input_frames)
        last_dev = to_device(last_output_frames)
        if self.mesh is not None:
            from ..parallel.mesh import shard_window_inputs

            text_embeds, cond_images, input_dev, last_dev = shard_window_inputs(
                self.mesh, text_embeds, cond_images, input_dev, last_dev
            )
            cond_images = list(cond_images)

        # the reference re-seeds identically on EVERY animate() call
        # (modules/controlanimate_pipeline.py:129-130), so each window draws
        # the same base noise — a temporal-consistency property, reproduced
        # here by not folding the epoch into the key
        key = jax.random.PRNGKey(seed)
        out = self.engine.generate_window(
            st,
            text_embeds,
            key,
            cond_images=cond_images,
            input_frames=input_dev,
            last_output_frames=last_dev,
            head_latents=head_latents,
        )
        if st.tail_latents:
            out, tail = out
            self._overlap_latent_cache = (epoch + 1, tail)
        if batched:
            return out  # (S, F, H, W, 3) uint8 DEVICE array
        return out[0]  # (F, H, W, 3) uint8 DEVICE array (quantized on device)
