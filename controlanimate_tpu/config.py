"""Configuration system.

Replaces the reference's OmegaConf-with-runtime-mutation pattern
(reference: scripts/vid2vid.py:85-86,147-154,188-196 mutates the config as a
runtime channel) with an immutable ``RunConfig`` loaded from the same YAML
schema (reference: configs/prompts/SampleConfig.yaml), an immutable
``ArchConfig`` (reference: configs/inference/inference-v{1,2}.yaml), and an
explicit per-window ``StitchState`` carrying the mutable generation state.

The YAML key names are kept identical to the reference's user configs so that
``configs/prompts/SampleConfig*.yaml`` files run unchanged.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import yaml


def _as_bool(v: Any) -> bool:
    if isinstance(v, str):
        return v.strip().lower() in ("1", "true", "yes", "y")
    return bool(v)


def _parse_hms(s: Optional[str]) -> Optional[float]:
    """Parse 'HH:MM:SS' to seconds (reference: scripts/vid2vid.py:64-77)."""
    if not s:
        return None
    t = time.strptime(str(s), "%H:%M:%S")
    return t.tm_hour * 3600 + t.tm_min * 60 + t.tm_sec


@dataclass(frozen=True)
class MotionModuleConfig:
    """Motion-module topology (reference: configs/inference/inference-v2.yaml
    ``unet_additional_kwargs.motion_module_kwargs``)."""

    num_attention_heads: int = 8
    num_transformer_block: int = 1
    attention_block_types: tuple[str, ...] = ("Temporal_Self", "Temporal_Self")
    temporal_position_encoding: bool = True
    temporal_position_encoding_max_len: int = 32
    temporal_attention_dim_div: int = 1
    # TPU extension (no reference counterpart): banded temporal attention —
    # each frame attends only to frames within ±attention_band. 0 = dense
    # (reference-exact). band >= F-1 is exactly dense; smaller bands are an
    # opt-in approximation that removes the F² term for long windows
    # (VERDICT r3 #3). Set via RunConfig.temporal_band.
    attention_band: int = 0


@dataclass(frozen=True)
class ArchConfig:
    """UNet inflation architecture config
    (reference: configs/inference/inference-v{1,2}.yaml unet_additional_kwargs
    consumed by animatediff/models/unet.py:62-74)."""

    use_inflated_groupnorm: bool = True
    unet_use_cross_frame_attention: bool = False
    unet_use_temporal_attention: bool = False
    use_motion_module: bool = True
    motion_module_resolutions: tuple[int, ...] = (1, 2, 4, 8)
    motion_module_mid_block: bool = True
    motion_module_decoder_only: bool = False
    motion_module_type: str = "Vanilla"
    motion_module: MotionModuleConfig = field(default_factory=MotionModuleConfig)
    # noise_scheduler_kwargs
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"
    num_train_timesteps: int = 1000
    steps_offset: int = 1
    clip_sample: bool = False

    def __post_init__(self):
        # Refuse silently-ignored architecture variants: a v1-style yaml with
        # these enabled would otherwise load a DIFFERENT model with no
        # warning. unet_use_cross_frame_attention is SUPPORTED (sparse-causal
        # attn1, models/transformer.py) — note the reference cannot run it at
        # all: its branch (animatediff/models/attention.py:195-196) names
        # `SparseCausalAttention2D`, which is defined nowhere in the repo.
        # unet_use_temporal_attention is SUPPORTED too (frame-axis attn
        # sublayer after each spatial block's FFN, models/transformer.py;
        # reference attention.py:240-251 — off in every shipped yaml).
        if self.use_motion_module and self.motion_module_type != "Vanilla":
            raise NotImplementedError(
                f"motion_module_type={self.motion_module_type!r}: only "
                "'Vanilla' exists (reference motion_module.py:39-47)."
            )

    @staticmethod
    def from_yaml(path: str | Path) -> "ArchConfig":
        raw = yaml.safe_load(Path(path).read_text())
        uak = dict(raw.get("unet_additional_kwargs") or {})
        nsk = dict(raw.get("noise_scheduler_kwargs") or {})
        mm_kwargs = dict(uak.pop("motion_module_kwargs", {}) or {})
        mm = MotionModuleConfig(
            num_attention_heads=int(mm_kwargs.get("num_attention_heads", 8)),
            num_transformer_block=int(mm_kwargs.get("num_transformer_block", 1)),
            attention_block_types=tuple(
                mm_kwargs.get("attention_block_types", ("Temporal_Self", "Temporal_Self"))
            ),
            temporal_position_encoding=_as_bool(
                mm_kwargs.get("temporal_position_encoding", True)
            ),
            temporal_position_encoding_max_len=int(
                mm_kwargs.get("temporal_position_encoding_max_len", 24)
            ),
            temporal_attention_dim_div=int(mm_kwargs.get("temporal_attention_dim_div", 1)),
            attention_band=int(mm_kwargs.get("attention_band", 0)),
        )
        return ArchConfig(
            use_inflated_groupnorm=_as_bool(uak.get("use_inflated_groupnorm", False)),
            unet_use_cross_frame_attention=_as_bool(
                uak.get("unet_use_cross_frame_attention", False)
            ),
            unet_use_temporal_attention=_as_bool(uak.get("unet_use_temporal_attention", False)),
            use_motion_module=_as_bool(uak.get("use_motion_module", True)),
            motion_module_resolutions=tuple(uak.get("motion_module_resolutions", (1, 2, 4, 8))),
            motion_module_mid_block=_as_bool(uak.get("motion_module_mid_block", False)),
            motion_module_decoder_only=_as_bool(uak.get("motion_module_decoder_only", False)),
            motion_module_type=str(uak.get("motion_module_type", "Vanilla")),
            motion_module=mm,
            beta_start=float(nsk.get("beta_start", 0.00085)),
            beta_end=float(nsk.get("beta_end", 0.012)),
            beta_schedule=str(nsk.get("beta_schedule", "linear")),
            num_train_timesteps=int(nsk.get("num_train_timesteps", 1000)),
            steps_offset=int(nsk.get("steps_offset", 1)),
            clip_sample=_as_bool(nsk.get("clip_sample", False)),
        )


@dataclass(frozen=True)
class RunConfig:
    """User/run configuration — one field per key of the reference's
    ``configs/prompts/*.yaml`` schema (reference: SampleConfig.yaml:1-119)."""

    # inputs / outputs
    input_video_path: str = ""
    output_video_dir: str = "output"
    save_frames: bool = False
    width: int = 512
    height: int = 512
    prompt: str = ""
    n_prompt: str = ""
    start_time: Optional[str] = None
    end_time: Optional[str] = None

    # generation modes
    overlap_strength: float = 0.92
    use_lcm: bool = False
    use_img2img: bool = False
    # reuse the previous window's clean VAE latents for the overlap input
    # frames (identical pixels) instead of re-encoding them — cuts the
    # per-window encode by overlap/frame_count on the LCM path. Off = strict
    # reference behavior (fresh posterior draw each window); the reused
    # latents are the same distribution and strictly more consistent.
    reuse_overlap_latents: bool = True

    # models
    pretrained_model_path: str = ""
    vae_path: Optional[str] = None
    dreambooth_path: Optional[str] = None
    lora_model_paths: tuple[str, ...] = ()
    lora_weights: tuple[float, ...] = ()
    inference_config_path: str = "configs/inference/inference-v2.yaml"
    motion_module: Optional[str] = None
    motion_lora_paths: tuple[str, ...] = ()
    motion_lora_alphas: tuple[float, ...] = ()
    pretrained_lcm_model_path: str = "models/LCM_Dreamshaper_v7"

    # controlnets
    controlnets: tuple[str, ...] = ()
    cond_scale: tuple[float, ...] = ()
    guess_mode: bool = False
    loop_back_frames: bool = False

    # ip-adapter
    use_ipadapter: bool = False
    ipa_scale: float = 0.65
    do_initial_generation: bool = False
    ipadapter_image_encoder_path: Optional[str] = None
    ipadapter_ckpt_path: Optional[str] = None

    # upscaler
    upscale: float = 1.0
    use_face_enhancer: bool = False
    upscale_first: bool = False
    upscaler_model_path: Optional[str] = None
    face_enhancer_model_path: Optional[str] = None
    # RetinaFace landmark detector for the face enhancer (defaults to
    # models/Upscalers/detection_Resnet50_Final.pth; Haar fallback if absent)
    face_detector_model_path: Optional[str] = None

    # window geometry
    frame_count: int = 16
    overlap_length: int = 8
    # txt2vid length: total frames to generate when there is no input video
    # (reference: scripts/vid2vid.py:50-52,168 `while frame_count <= total_frames`);
    # 0 = one window
    total_frames: int = 0

    # sampling
    seed: int = -1
    steps: int = 30
    guidance_scale: float = 7.5
    strength: float = 1.0
    scheduler: str = "EulerDiscreteScheduler"
    lcm_origin_steps: int = 50
    # CLIP penultimate-layer selection; the reference engine accepts this
    # (controlanimation_pipeline.py:295-474 encode_prompt clip_skip) but its
    # product path never exposes a config key — this one does
    clip_skip: int = 0
    # encoder propagation (arXiv:2312.09608, beyond-reference acceleration):
    # every Nth denoise step runs the full UNet+ControlNets and caches the
    # encoder features; steps between run decoder-only against the cache.
    # 0/1 = off. Multi-step samplers only (the engine rejects it with LCM)
    encoder_reuse_every: int = 0
    # banded temporal attention (beyond-reference acceleration): each frame
    # attends only to frames within ±temporal_band in the motion modules,
    # removing the F² term for long windows. 0 = dense (reference-exact);
    # band >= frame_count-1 is also exactly dense. Opt-in approximation —
    # quantify with scripts/eval_quality.py before shipping a band
    temporal_band: int = 0
    # ToMe-SD token merging (arXiv:2303.17604, beyond-reference
    # acceleration): this fraction of spatial tokens merges before each
    # level-0 self-attention and unmerges after (ops/token_merge.py).
    # 0 = off (byte-identical program). Opt-in approximation — quantify
    # with scripts/eval_quality.py before shipping a ratio
    token_merge_ratio: float = 0.0
    # extend the merge to the motion modules (frame-consistent token set,
    # one plan per module — beyond ToMe-SD, whose SD target has no temporal
    # module). Needs token_merge_ratio > 0
    token_merge_motion: bool = False
    # only merge at UNet levels with at least this many spatial tokens
    # (4096 = level 0 only at 512px — the tomesd max_downsample analog)
    token_merge_min_tokens: int = 4096

    # media
    fps: int = 15
    fps_ffmpeg: int = 30
    crf: int = 23
    ffmpeg_path: str = "ffmpeg"

    # textual inversion
    textual_inversion_paths: tuple[str, ...] = ("models/TI/easynegative.safetensors",)

    # job checkpoint/resume (new; the reference loses all progress on a
    # mid-video crash — SURVEY §5.3/§5.4). Saves run on a worker thread
    # (the overlap-state readback overlaps device compute) and only record
    # frames already flushed to the sink; the interval bounds both the d2h
    # bandwidth spent on snapshots and the windows lost to a crash
    checkpoint_interval: int = 4
    resume: bool = False
    # profiling (new; reference has no tracing subsystem — SURVEY §5.1)
    trace_dir: Optional[str] = None

    # tpu execution policy (new; no reference equivalent — the reference
    # hardcodes "cuda" + .half(), modules/controlanimate_pipeline.py:68,108-110)
    dtype: str = "bfloat16"
    mesh_shape: tuple[int, ...] = ()
    mesh_axes: tuple[str, ...] = ("data", "context")
    # segment-parallel vid2vid (new; SURVEY §2.13 data-parallel plan): split
    # the input video into this many contiguous segments and generate them
    # LOCKSTEP as one batched window program — the segment axis is the batch
    # axis, sharded over the mesh's `data` axis when a mesh is configured
    # (or MXU-batched on one chip). Each segment stitches independently,
    # exactly like the reference run on each segment separately (same seed);
    # segment boundaries carry no overlap, like the reference's own clip
    # boundaries. 0/1 = sequential (reference behavior)
    parallel_segments: int = 0
    # XLA's fused attention measured ~12% faster than the Pallas kernel on
    # v5e (see ops/attention.py); enable Pallas for fast cold starts on
    # remote-compile paths (it compiles ~700x faster through the tunnel)
    use_pallas_attention: bool = False
    # Pallas fused GN+SiLU+conv3x3 for the VAE (ops/conv_kernel.py): XLA's
    # convs measured faster on v5e, but the kernels compile in seconds where
    # XLA takes minutes through remote-compile tunnels — a cold-start knob
    use_pallas_conv: bool = False
    # read + annotate window N+1 on a host thread while window N occupies
    # the device (SURVEY §7 hard-part 6; the reference blocks serially)
    overlap_host_work: bool = True
    # GIL-free C++ ring-buffer pipe for ffmpeg framing (runtime/framepipe.cpp);
    # falls back to the Python-threaded pipe when the toolchain is missing
    use_native_framepipe: bool = True

    # extras bag for forward-compat keys
    extras: dict = field(default_factory=dict, hash=False, compare=False)

    @property
    def start_seconds(self) -> Optional[float]:
        return _parse_hms(self.start_time)

    @property
    def end_seconds(self) -> Optional[float]:
        return _parse_hms(self.end_time)

    @staticmethod
    def from_yaml(path: str | Path) -> "RunConfig":
        raw = yaml.safe_load(Path(path).read_text()) or {}
        return RunConfig.from_dict(raw)

    @staticmethod
    def from_dict(raw: dict) -> "RunConfig":
        known = {f.name: f for f in dataclasses.fields(RunConfig)}
        bool_keys = {
            "save_frames", "use_lcm", "use_img2img", "guess_mode",
            "loop_back_frames", "use_ipadapter", "do_initial_generation",
            "use_face_enhancer", "upscale_first", "use_pallas_attention",
            "use_pallas_conv", "overlap_host_work", "use_native_framepipe",
            "resume", "reuse_overlap_latents",
        }
        tuple_keys = {
            "lora_model_paths", "lora_weights", "controlnets", "cond_scale",
            "motion_lora_paths", "motion_lora_alphas", "textual_inversion_paths",
            "mesh_shape", "mesh_axes",
        }
        kwargs: dict[str, Any] = {}
        extras: dict[str, Any] = {}
        for k, v in raw.items():
            if k not in known:
                extras[k] = v
                continue
            if k in bool_keys:
                v = _as_bool(v)
            elif k in tuple_keys:
                v = tuple(v) if v is not None else ()
            elif v is not None and known[k].type in ("int", int):
                v = int(v)
            kwargs[k] = v
        kwargs["extras"] = extras
        return RunConfig(**kwargs)

    def replace(self, **kw) -> "RunConfig":
        return dataclasses.replace(self, **kw)


@dataclass
class StitchState:
    """Per-window mutable generation state, made explicit.

    The reference smuggles all of this through config mutation and local
    variables in the epoch loop (scripts/vid2vid.py:153-231).

    The output-side fields (overlap_frames, last_output_frames,
    last_output_frame) are STACKED uint8 arrays — host numpy after a resume,
    jax device arrays during a run, so the stitch pipeline never round-trips
    frames through the host between windows. overlap_input_frames stays a
    host list (it feeds window assembly and host annotators).
    """

    epoch: int = 0
    seed: int = 0
    # previous window's *output* frames for the overlap slots: (K, H, W, 3)
    overlap_frames: Optional[Any] = None
    # previous window's *input* frames re-presented in the overlap slots
    overlap_input_frames: list = field(default_factory=list)
    # anchors for img2img / IP-Adapter (reference: vid2vid.py:229-231)
    last_output_frames: Optional[Any] = None
    # color-match reference frame (reference: vid2vid.py:220): (H, W, 3)
    last_output_frame: Optional[Any] = None

    @property
    def overlap_length(self) -> int:
        return 0 if self.overlap_frames is None else int(self.overlap_frames.shape[0])
