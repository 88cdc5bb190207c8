"""Full-loop end-to-end test: orchestrator + facade + engine with tiny
random models and in-memory frame IO (the reference has no equivalent — its
only 'test' runs the real pipeline on real files, vid2vid.py:291-294)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.config import MotionModuleConfig, RunConfig
from controlanimate_tpu.io.media import ArrayFrameSink, ArrayFrameSource
from controlanimate_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from controlanimate_tpu.models.controlnet import ControlNetModel
from controlanimate_tpu.models.tokenizer import CLIPTokenizer
from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from controlanimate_tpu.models.vae import AutoencoderKL
from controlanimate_tpu.pipelines.engine import EngineModels
from controlanimate_tpu.pipelines.facade import ControlAnimatePipeline, TextStack
from scripts.vid2vid import vid2vid

D_CTX = 16


def tiny_pipeline(cfg: RunConfig, with_controlnet=False, ip_adapter=None,
                  lcm=False) -> ControlAnimatePipeline:
    key = jax.random.PRNGKey(0)
    ucfg = UNet3DConfig(
        block_out_channels=(8, 16),
        layers_per_block=1,
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
        attention_heads=2,
        cross_attention_dim=D_CTX,
        norm_num_groups=4,
        time_cond_proj_dim=32 if lcm else None,  # LCM w-embedding input
        motion=MotionModuleConfig(num_attention_heads=2, temporal_position_encoding_max_len=8),
    )
    unet = UNet3DConditionModel(ucfg)
    init_kw = {"timestep_cond": jnp.zeros((1, 32))} if lcm else {}
    unet_params = unet.init(
        key, jnp.zeros((1, 2, 8, 8, 4)), jnp.asarray([1]), jnp.zeros((1, 7, D_CTX)),
        **init_kw,
    )["params"]
    vae = AutoencoderKL(block_out_channels=(4, 8, 8, 8), groups=2)
    vae_params = vae.init(key, jnp.zeros((1, 64, 64, 3)))["params"]

    cns, cn_params = [], []
    if with_controlnet:
        cn_cfg = UNet3DConfig(**{**ucfg.__dict__, "use_motion_module": False})
        cn = ControlNetModel(cn_cfg)
        cns = [cn]
        cn_params = [
            cn.init(
                key, jnp.zeros((1, 2, 8, 8, 4)), jnp.asarray([1]),
                jnp.zeros((1, 7, D_CTX)), jnp.zeros((1, 2, 64, 64, 3)),
            )["params"]
        ]

    models = EngineModels(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        controlnets=cns, controlnet_params=cn_params,
        cond_scales=[1.0] * len(cns),
    )

    tok = CLIPTokenizer.tiny()
    tcfg = CLIPTextConfig(
        vocab_size=len(tok.vocab), hidden_size=D_CTX, num_layers=2, num_heads=2,
        intermediate_size=32, eos_token_id=tok.eos_token_id,
    )
    tmodel = CLIPTextModel(tcfg)
    tparams = tmodel.init(key, jnp.zeros((1, 77), jnp.int32))["params"]
    text = TextStack(tok, tmodel, tparams)
    return ControlAnimatePipeline(cfg, models=models, text_stack=text, ip_adapter=ip_adapter)


import pytest


@pytest.fixture(scope="module")
def base_pipe():
    """One shared tiny pipeline: the facade caches jitted window programs
    per WindowStatic, so tests with the same geometry skip CPU recompiles
    (the suite runs on a single core — compiles dominate wall time)."""
    return tiny_pipeline(base_cfg())


def base_cfg(**kw) -> RunConfig:
    defaults = dict(
        width=64, height=64, frame_count=4, overlap_length=2,
        steps=2, guidance_scale=1.0, scheduler="EulerDiscreteScheduler",
        seed=7, prompt="a cat", n_prompt="blurry", strength=0.95,
        overlap_strength=0.9, fps=8, save_frames=False,
        output_video_dir="/tmp/ca_tpu_test_out",
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_vid2vid_loop_writes_all_frames(base_pipe):
    cfg = base_cfg()
    pipe = base_pipe
    frames_in = (np.random.RandomState(0).rand(10, 64, 64, 3) * 255).astype(np.uint8)
    sink = ArrayFrameSink()
    calls = []
    summary = vid2vid(
        config=cfg, pipeline=pipe,
        frame_source=ArrayFrameSource(frames_in), frame_sink=sink,
        progress=calls.append,
    )
    # 10 in -> 10 out (epochs emit len-2, final flush emits the tail 2)
    assert summary["frames_written"] == 10
    assert len(sink.frames) == 10
    assert sink.frames[0].shape == (64, 64, 3)
    # multiple windows ran with overlap chaining
    assert summary["windows"] == 4
    # live progress fired once per window with monotone counts
    assert [c["windows"] for c in calls] == [1, 2, 3, 4]
    assert calls[-1]["frames_written"] == 8  # the 2-frame tail flushes after


def test_vid2vid_with_controlnet_canny():
    cfg = base_cfg(controlnets=("lllyasviel/sd-controlnet-canny",), cond_scale=(1.0,))
    pipe = tiny_pipeline(cfg, with_controlnet=True)
    frames_in = (np.random.RandomState(1).rand(4, 64, 64, 3) * 255).astype(np.uint8)
    sink = ArrayFrameSink()
    summary = vid2vid(
        config=cfg, pipeline=pipe,
        frame_source=ArrayFrameSource(frames_in), frame_sink=sink,
    )
    assert summary["frames_written"] == 4


def test_txt2vid_no_input(base_pipe):
    cfg = base_cfg(overlap_length=0)
    pipe = base_pipe
    sink = ArrayFrameSink()
    summary = vid2vid(config=cfg, pipeline=pipe, frame_sink=sink, max_windows=1)
    assert summary["frames_written"] == 4


@pytest.mark.slow
def test_txt2vid_total_frames(base_pipe):
    """txt2vid generates overlap-stitched windows until total_frames
    (reference: vid2vid.py:50-52,168 — ADVICE r1: the loop used to stop
    after exactly one window)."""
    cfg = base_cfg(total_frames=10, frame_count=4, overlap_length=2)
    pipe = base_pipe
    sink = ArrayFrameSink()
    summary = vid2vid(config=cfg, pipeline=pipe, frame_sink=sink)
    assert summary["frames_written"] == 10
    assert summary["windows"] == 4  # 2 new frames/window after the first


def test_deterministic_given_seed(base_pipe):
    cfg = base_cfg()
    pipe = base_pipe
    frames_in = (np.random.RandomState(2).rand(4, 64, 64, 3) * 255).astype(np.uint8)
    s1, s2 = ArrayFrameSink(), ArrayFrameSink()
    vid2vid(config=cfg, pipeline=pipe, frame_source=ArrayFrameSource(frames_in), frame_sink=s1)
    vid2vid(config=cfg, pipeline=pipe, frame_source=ArrayFrameSource(frames_in), frame_sink=s2)
    for a, b in zip(s1.frames, s2.frames):
        np.testing.assert_array_equal(a, b)


def test_resume_mid_video(base_pipe, tmp_path):
    """Epoch-granular resume (new capability vs reference, SURVEY §5.3/§5.4):
    interrupt after 2 windows, resume, and finish the stream."""
    cfg = base_cfg(output_video_dir=str(tmp_path), resume=False)
    pipe = base_pipe
    frames_in = (np.random.RandomState(3).rand(10, 64, 64, 3) * 255).astype(np.uint8)

    s1 = ArrayFrameSink()
    partial = vid2vid(
        config=cfg, pipeline=pipe,
        frame_source=ArrayFrameSource(frames_in), frame_sink=s1, max_windows=2,
    )
    assert (tmp_path / "stitch_state.npz").exists()
    # 2 windows emit 2 novel frames each; the pending tail overlap is NOT
    # flushed on an interrupted run — the resumed first window re-emits those
    # timeline positions (blended), so flushing here would duplicate them at
    # the resume splice
    assert partial["windows"] == 2
    assert partial["frames_written"] == 4

    cfg2 = cfg.replace(resume=True)
    s2 = ArrayFrameSink()
    resumed = vid2vid(
        config=cfg2, pipeline=pipe,
        frame_source=ArrayFrameSource(frames_in), frame_sink=s2,
    )
    assert resumed["windows"] == 2  # the remaining 2 windows
    # both runs together cover the whole 10-frame stream EXACTLY once
    # (4 + 2·2 novel + 2 tail): no duplicated positions at the splice
    assert partial["frames_written"] + len(s2.frames) == 10


def test_encoder_reuse_plumbs_through_facade():
    """RunConfig.encoder_reuse_every reaches the engine program (opt-in
    encoder propagation, arXiv:2312.09608): the run completes and differs
    from the full-compute run with the same seed."""
    frames_in = (np.random.RandomState(9).rand(4, 64, 64, 3) * 255).astype(np.uint8)
    outs = []
    for reuse in (0, 2):
        cfg = base_cfg(encoder_reuse_every=reuse, steps=4, checkpoint_interval=0)
        sink = ArrayFrameSink()
        s = vid2vid(config=cfg, pipeline=tiny_pipeline(cfg),
                    frame_source=ArrayFrameSource(frames_in), frame_sink=sink)
        assert s["frames_written"] == 4
        outs.append(np.stack(sink.frames))
    assert not np.array_equal(outs[0], outs[1])


def test_interrupted_without_checkpointing_flushes_tail(base_pipe, tmp_path):
    """With checkpointing disabled there is nothing to resume from, so an
    interrupted (max_windows-bounded) run must flush the pending tail
    overlap — withholding it (the resumable-run behavior) would lose the
    generated frames unrecoverably (r3 review finding)."""
    cfg = base_cfg(output_video_dir=str(tmp_path), checkpoint_interval=0)
    frames_in = (np.random.RandomState(4).rand(10, 64, 64, 3) * 255).astype(np.uint8)
    sink = ArrayFrameSink()
    s = vid2vid(
        config=cfg, pipeline=base_pipe,
        frame_source=ArrayFrameSource(frames_in), frame_sink=sink, max_windows=2,
    )
    assert not (tmp_path / "stitch_state.npz").exists()
    # 2 windows x 2 novel + the 2-frame tail: the partial output is complete
    assert s["windows"] == 2
    assert s["frames_written"] == 6
    assert len(sink.frames) == 6


def test_completion_clears_stale_checkpoint(base_pipe, tmp_path):
    """A run that completes naturally clears any stitch_state.npz left in
    its output dir by an earlier interrupted run — even when it itself ran
    with checkpointing disabled — so a later resume=True cannot load
    another run's obsolete state (r3 review finding)."""
    cfg = base_cfg(output_video_dir=str(tmp_path))
    frames_in = (np.random.RandomState(6).rand(10, 64, 64, 3) * 255).astype(np.uint8)
    vid2vid(config=cfg, pipeline=base_pipe,
            frame_source=ArrayFrameSource(frames_in),
            frame_sink=ArrayFrameSink(), max_windows=2)
    assert (tmp_path / "stitch_state.npz").exists()

    vid2vid(config=cfg.replace(checkpoint_interval=0), pipeline=base_pipe,
            frame_source=ArrayFrameSource(frames_in),
            frame_sink=ArrayFrameSink())
    assert not (tmp_path / "stitch_state.npz").exists()


@pytest.mark.slow
def test_ipadapter_initial_generation_loop():
    """IP-Adapter path end to end: zeros tokens on the first window, anchor
    embeds afterwards, plus the initial double-generation pass
    (reference: vid2vid.py:199-212, controlanimation_pipeline.py:698-710)."""
    import jax.numpy as jnp
    from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
    from controlanimate_tpu.pipelines.ip_adapter import IPAdapter

    class StubAdapter:
        num_tokens = 4

        def embed_image(self, frame):
            e = jnp.asarray(np.asarray(frame, np.float32).mean() / 255.0)
            cond = jnp.ones((1, 4, D_CTX)) * e
            return cond, jnp.zeros((1, 4, D_CTX))

    cfg = base_cfg(use_ipadapter=True, do_initial_generation=True, ipa_scale=0.6)
    pipe = tiny_pipeline(cfg, ip_adapter=StubAdapter())

    # rebuild the unet with dual-stream cross attention (ip_tokens=4)
    ucfg = UNet3DConfig(**{**pipe.models.unet.config.__dict__, "ip_tokens": 4})
    unet = UNet3DConditionModel(ucfg)
    ctx = jnp.zeros((1, 11, D_CTX))
    unet_params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)), jnp.asarray([1]), ctx
    )["params"]
    pipe.models.unet = unet
    pipe.models.unet_params = unet_params
    pipe.engine.m.unet = unet
    pipe.engine.m.unet_params = unet_params

    frames_in = (np.random.RandomState(5).rand(6, 64, 64, 3) * 255).astype(np.uint8)
    sink = ArrayFrameSink()
    summary = vid2vid(
        config=cfg, pipeline=pipe,
        frame_source=ArrayFrameSource(frames_in), frame_sink=sink,
    )
    assert summary["frames_written"] == 6


@pytest.mark.slow
def test_sharded_pipeline_on_virtual_mesh(eight_devices):
    """Config-driven mesh: the same vid2vid loop over a 1x8 data x context
    mesh on virtual CPU devices (SURVEY §5.8 sharding plan)."""
    cfg = base_cfg(mesh_shape=(1, 8), frame_count=8, overlap_length=0, steps=2, strength=1.0)
    pipe = tiny_pipeline(cfg)
    from controlanimate_tpu.parallel.mesh import make_mesh, shard_params

    pipe.mesh = make_mesh((1, 8), ("data", "context"))
    pipe.models.unet_params = shard_params(pipe.mesh, pipe.models.unet_params)
    pipe.models.vae_params = shard_params(pipe.mesh, pipe.models.vae_params)
    pipe.engine.m.unet_params = pipe.models.unet_params
    pipe.engine.m.vae_params = pipe.models.vae_params

    frames_in = (np.random.RandomState(6).rand(8, 64, 64, 3) * 255).astype(np.uint8)
    sink = ArrayFrameSink()
    summary = vid2vid(
        config=cfg, pipeline=pipe,
        frame_source=ArrayFrameSource(frames_in), frame_sink=sink,
    )
    assert summary["frames_written"] == 8


def test_save_frames_and_info(tmp_path):
    cfg = base_cfg(save_frames=True, output_video_dir=str(tmp_path))
    pipe = tiny_pipeline(cfg)
    frames_in = (np.random.RandomState(7).rand(4, 64, 64, 3) * 255).astype(np.uint8)
    vid2vid(config=cfg, pipeline=pipe, frame_source=ArrayFrameSource(frames_in),
            frame_sink=ArrayFrameSink())
    assert (tmp_path / "info.json").exists()
    assert len(list((tmp_path / "vid2vid_frames").glob("*.png"))) >= 2
    assert len(list((tmp_path / "vid2vid_input_frames").glob("*.png"))) >= 2


@pytest.mark.slow
def test_controlnet_condition_map_dumps(tmp_path):
    """Per-epoch condition-map dumps under controlnet_outputs_<ts>/<net>/
    (reference: controlresiduals_pipeline.py:239,249-259)."""
    cfg = base_cfg(
        save_frames=True, output_video_dir=str(tmp_path),
        controlnets=("lllyasviel/sd-controlnet-canny",), cond_scale=(1.0,),
    )
    pipe = tiny_pipeline(cfg, with_controlnet=True)
    frames_in = (np.random.RandomState(8).rand(4, 64, 64, 3) * 255).astype(np.uint8)
    vid2vid(config=cfg, pipeline=pipe, frame_source=ArrayFrameSource(frames_in),
            frame_sink=ArrayFrameSink())
    roots = list(tmp_path.glob("controlnet_outputs_*"))
    assert len(roots) == 1
    pngs = list((roots[0] / "sd-controlnet-canny").glob("*.png"))
    assert len(pngs) == 4  # one per window frame


def test_overlap_latent_reuse(monkeypatch):
    """LCM windows reuse the previous window's clean tail latents for the
    overlap input frames (RunConfig.reuse_overlap_latents, default on):
    steady-state prepare encodes only the novel frames, and the facade
    carries the tail cache across windows. Off = the reference's re-encode-
    everything behavior (controlanimation_pipeline.py:565-588)."""
    from controlanimate_tpu.pipelines.engine import AnimationEngine

    encode_shapes = []
    orig = AnimationEngine._encode_frames

    def spy(self, vp, frames, key):
        encode_shapes.append(int(frames.shape[1]))
        return orig(self, vp, frames, key)

    monkeypatch.setattr(AnimationEngine, "_encode_frames", spy)

    lcm_kw = dict(use_lcm=True, scheduler="LCMScheduler", steps=2,
                  guidance_scale=7.5, lcm_origin_steps=50)
    cfg = base_cfg(**lcm_kw)
    pipe = tiny_pipeline(cfg, lcm=True)
    frames_in = (np.random.RandomState(3).rand(10, 64, 64, 3) * 255).astype(np.uint8)
    sink = ArrayFrameSink()
    summary = vid2vid(config=cfg, pipeline=pipe,
                      frame_source=ArrayFrameSource(frames_in), frame_sink=sink)
    assert summary["frames_written"] == 10 and summary["windows"] == 4
    assert all(np.isfinite(np.asarray(f, np.float32)).all() for f in sink.frames)
    # trace evidence: window 1 traced a full 4-frame encode, the steady-state
    # window traced a 2-frame (novel-only) encode
    assert 4 in encode_shapes and 2 in encode_shapes
    # the cache points at the NEXT window and holds overlap_length latents
    tag, tail = pipe._overlap_latent_cache
    assert tag == summary["windows"] and tail.shape[1] == cfg.overlap_length

    # reuse disabled: every window encodes the full frame_count, cache unset
    encode_shapes.clear()
    cfg_off = base_cfg(reuse_overlap_latents=False, **lcm_kw)
    pipe_off = ControlAnimatePipeline(cfg_off, models=pipe.models, text_stack=pipe.text)
    summary = vid2vid(config=cfg_off, pipeline=pipe_off,
                      frame_source=ArrayFrameSource(frames_in), frame_sink=ArrayFrameSink())
    assert summary["frames_written"] == 10
    assert set(encode_shapes) == {4}
    assert pipe_off._overlap_latent_cache is None


# ---------------------------------------------------------------- segments
def test_segment_parallel_counts_and_determinism(base_pipe):
    """parallel_segments=2: lockstep batched windows cover every input frame
    exactly once (SURVEY §2.13 data-parallel plan), deterministically."""
    cfg = base_cfg(parallel_segments=2, checkpoint_interval=0)
    # T=20, S=2, F=4, ov=2 -> per-segment 10 frames = 4 windows, no padding
    frames_in = (np.random.RandomState(11).rand(20, 64, 64, 3) * 255).astype(np.uint8)
    sinks = []
    for _ in range(2):
        sink = ArrayFrameSink()
        summary = vid2vid(
            config=cfg, pipeline=base_pipe,
            frame_source=ArrayFrameSource(frames_in), frame_sink=sink,
        )
        assert summary["frames_written"] == 20
        assert summary["segments"] == 2
        assert summary["windows"] == 4  # per segment, lockstep
        assert len(sink.frames) == 20
        sinks.append(np.stack(sink.frames))
    np.testing.assert_array_equal(sinks[0], sinks[1])


def test_segment_parallel_matches_sequential_per_segment(base_pipe):
    """THE parity contract: segment s of a parallel run reproduces a
    sequential run on segment s's frames alone with the same seed (the
    reference, run separately per segment, re-seeds identically —
    schedulers/base.py batch_shared_normal). Single-window geometry: across
    chained windows the uint8 re-encode feedback amplifies the batched-vs-
    single program's float differences beyond bit-comparability."""
    frames_in = (np.random.RandomState(17).rand(8, 64, 64, 3) * 255).astype(np.uint8)

    cfg_par = base_cfg(parallel_segments=2, checkpoint_interval=0)
    sink_par = ArrayFrameSink()
    sp = vid2vid(config=cfg_par, pipeline=base_pipe,
                 frame_source=ArrayFrameSource(frames_in), frame_sink=sink_par)
    assert sp["frames_written"] == 8 and sp["windows"] == 1

    cfg_seq = base_cfg(checkpoint_interval=0)
    seq = []
    for s in range(2):
        sink = ArrayFrameSink()
        vid2vid(config=cfg_seq, pipeline=base_pipe,
                frame_source=ArrayFrameSource(frames_in[s * 4:(s + 1) * 4]),
                frame_sink=sink)
        seq.extend(sink.frames)

    a = np.stack(sink_par.frames).astype(np.int32)
    b = np.stack(seq).astype(np.int32)
    assert np.abs(a - b).max() <= 1  # batched-program rounding only


def test_segment_parallel_pads_and_trims_tail(base_pipe):
    """When segment lengths don't divide evenly the last segment is padded
    by repeating its final frame; the pad is trimmed on emit."""
    cfg = base_cfg(parallel_segments=2, checkpoint_interval=0)
    # T=18 -> per-segment 9 -> k=4 windows, seg_len=10, padded to 20, trim 2
    frames_in = (np.random.RandomState(12).rand(18, 64, 64, 3) * 255).astype(np.uint8)
    sink = ArrayFrameSink()
    summary = vid2vid(
        config=cfg, pipeline=base_pipe,
        frame_source=ArrayFrameSource(frames_in), frame_sink=sink,
    )
    assert summary["frames_written"] == 18
    assert len(sink.frames) == 18

    # degenerate split: T=5 over S=4 leaves trailing segments that are pure
    # pad — they must be skipped on emit, not crash np.stack([])
    cfg4 = base_cfg(parallel_segments=4, checkpoint_interval=0)
    frames_5 = (np.random.RandomState(16).rand(5, 64, 64, 3) * 255).astype(np.uint8)
    sink5 = ArrayFrameSink()
    s5 = vid2vid(config=cfg4, pipeline=base_pipe,
                 frame_source=ArrayFrameSource(frames_5), frame_sink=sink5)
    assert s5["frames_written"] == 5
    assert len(sink5.frames) == 5


def test_segment_parallel_max_windows_keeps_boundaries(base_pipe):
    """max_windows bounds windows PER SEGMENT without moving the segment
    split: a bounded debug run emits, per segment, a prefix of the unbounded
    run's frames for that same segment (before the r3 review fix the input
    was re-split by the BOUNDED window count, so every boundary moved and
    segment 1 processed different content)."""
    cfg = base_cfg(parallel_segments=2, checkpoint_interval=0)
    # T=20 -> per-segment 10 -> k=4 windows/segment, seg_len=10, no pad
    frames_in = (np.random.RandomState(21).rand(20, 64, 64, 3) * 255).astype(np.uint8)

    full_sink = ArrayFrameSink()
    full = vid2vid(config=cfg, pipeline=base_pipe,
                   frame_source=ArrayFrameSource(frames_in), frame_sink=full_sink)
    assert full["frames_written"] == 20

    b_sink = ArrayFrameSink()
    bounded = vid2vid(config=cfg, pipeline=base_pipe,
                      frame_source=ArrayFrameSource(frames_in),
                      frame_sink=b_sink, max_windows=2)
    # 2 windows x 2 novel + 2-frame tail per segment
    assert bounded["frames_written"] == 12
    # in-loop frames (before the unblended tail) are bit-exact prefixes of
    # the unbounded run's per-segment output; both runs use the same batched
    # programs with identical inputs and seeds
    for s, (b_lo, f_lo) in enumerate([(0, 0), (6, 10)]):
        np.testing.assert_array_equal(
            np.stack(b_sink.frames[b_lo:b_lo + 4]),
            np.stack(full_sink.frames[f_lo:f_lo + 4]),
            err_msg=f"segment {s} bounded prefix diverged",
        )


def test_segment_parallel_rejects_unsupported_modes(base_pipe):
    frames_in = (np.random.RandomState(13).rand(8, 64, 64, 3) * 255).astype(np.uint8)
    for bad in (dict(save_frames=True), dict(resume=True)):
        cfg = base_cfg(parallel_segments=2, **bad)
        with pytest.raises(ValueError):
            vid2vid(config=cfg, pipeline=base_pipe,
                    frame_source=ArrayFrameSource(frames_in),
                    frame_sink=ArrayFrameSink())
    # txt2vid has a sequential dependency between windows
    with pytest.raises(ValueError):
        vid2vid(config=base_cfg(parallel_segments=2, total_frames=8),
                pipeline=base_pipe, frame_source=None, frame_sink=ArrayFrameSink())
    # overlap >= frame_count: the sequential loop degenerates gracefully, but
    # the segment window-count math would divide by zero — fail loudly
    with pytest.raises(ValueError, match="overlap_length"):
        vid2vid(config=base_cfg(parallel_segments=2, overlap_length=4),
                pipeline=base_pipe, frame_source=ArrayFrameSource(frames_in),
                frame_sink=ArrayFrameSink())


class _YuvArraySink(ArrayFrameSink):
    pix_fmt = "yuv420p"


class _Nearest4xUpscaler:
    """Deterministic stand-in for the RealESRGAN device path."""

    def upscale_batch_device(self, frames):
        import jax.numpy as jnp
        f = jnp.asarray(frames)
        return jnp.repeat(jnp.repeat(f, 4, axis=1), 4, axis=2)


def test_segment_parallel_upscale_packs_yuv_sink(base_pipe):
    """Upscaled RGB behind a yuv420p sink must be packed to I420 before the
    write — raw RGB bytes are 2x an I420 frame, so every subsequent frame in
    the stream would misalign (found in r3 review). Byte-for-byte: the yuv
    run's frames equal rgb_to_yuv420 of the rgb24 run's frames."""
    from controlanimate_tpu.ops.yuv import rgb_to_yuv420

    frames_in = (np.random.RandomState(19).rand(8, 64, 64, 3) * 255).astype(np.uint8)
    cfg = base_cfg(parallel_segments=2, checkpoint_interval=0, upscale=4.0)

    rgb_sink = ArrayFrameSink()  # no pix_fmt attr -> rgb24 path
    vid2vid(config=cfg, pipeline=base_pipe,
            frame_source=ArrayFrameSource(frames_in), frame_sink=rgb_sink,
            upscaler=_Nearest4xUpscaler())
    assert len(rgb_sink.frames) == 8
    assert rgb_sink.frames[0].shape == (256, 256, 3)

    yuv_sink = _YuvArraySink()
    summary = vid2vid(config=cfg, pipeline=base_pipe,
                      frame_source=ArrayFrameSource(frames_in), frame_sink=yuv_sink,
                      upscaler=_Nearest4xUpscaler())
    assert summary["frames_written"] == 8
    assert len(yuv_sink.frames) == 8
    for fr in yuv_sink.frames:
        assert fr.size == 256 * 256 * 3 // 2  # planar I420 at the 4x size
    expect = np.asarray(rgb_to_yuv420(np.stack(rgb_sink.frames)))
    np.testing.assert_array_equal(np.stack(yuv_sink.frames), expect)


def test_sequential_host_upscale_packs_yuv_sink(base_pipe):
    """The sequential _emit host-upscale fallback (upscale 4.0, no RRDB
    weights -> upscaler None) behind a yuv420p sink must pack to I420 too."""
    frames_in = (np.random.RandomState(23).rand(4, 64, 64, 3) * 255).astype(np.uint8)
    cfg = base_cfg(checkpoint_interval=0, upscale=4.0)
    sink = _YuvArraySink()
    summary = vid2vid(config=cfg, pipeline=base_pipe,
                      frame_source=ArrayFrameSource(frames_in), frame_sink=sink,
                      upscaler=None)
    assert summary["frames_written"] == 4
    for fr in sink.frames:
        assert fr.size == 256 * 256 * 3 // 2


def test_pick_decode_chunk_accounts_for_segments():
    """The VAE-decode HBM guard counts TOTAL B*F frames and must return a
    divisor of the total (engine falls back to one shot otherwise)."""
    from controlanimate_tpu.pipelines.facade import ControlAnimatePipeline

    pick = ControlAnimatePipeline._pick_decode_chunk
    px = 512 * 512
    assert pick(16, px) == 0          # single window, fits whole
    assert pick(24, px) == 0          # measured fine un-chunked
    assert pick(32, px) == 16         # F=32 single segment
    assert pick(48, px) == 24         # F=24, S=2
    assert pick(64, px) == 16         # F=16, S=4
    assert pick(72, px) == 24         # F=24, S=3
    assert pick(40, px) == 20         # F=20, S=2 -> divisor, not 24
    assert pick(64, 64 * 64) == 0     # small frames never need chunking
    for total in (32, 40, 48, 64, 72, 96, 100):
        c = pick(total, px)
        assert c and total % c == 0 and c <= 24


@pytest.mark.slow
def test_segment_parallel_sharded_equals_unsharded(eight_devices):
    """Segment-parallel run with the segment axis sharded over a 4x2
    data x context mesh must reproduce the single-device batched run
    (uint8 output; GSPMD reduction reordering may flip at most 1 LSB).

    Single-window geometry on purpose: with MULTIPLE chained windows each
    window re-encodes the previous window's quantized uint8 output, so a
    +-1 LSB flip amplifies through the diffusion chain and bit-equality is
    unattainable for ANY backend-order change (measured max diff 27 after
    3 windows) — the multi-window sharded case is covered as a counts +
    finiteness smoke below."""
    # T=14, S=4, F=4, ov=2 -> per-segment 4 -> k=1 window, seg_len 4,
    # padded to 16, trim 2 on emit (pad+trim exercised under sharding)
    frames_in = (np.random.RandomState(14).rand(14, 64, 64, 3) * 255).astype(np.uint8)

    cfg = base_cfg(parallel_segments=4, checkpoint_interval=0)
    pipe = tiny_pipeline(cfg)
    sink_single = ArrayFrameSink()
    s1 = vid2vid(config=cfg, pipeline=pipe,
                 frame_source=ArrayFrameSource(frames_in), frame_sink=sink_single)

    # the facade constructor builds the mesh + shards params from the config
    cfg_m = cfg.replace(mesh_shape=(4, 2))
    pipe_m = tiny_pipeline(cfg_m)
    assert pipe_m.mesh is not None
    sink_mesh = ArrayFrameSink()
    s2 = vid2vid(config=cfg_m, pipeline=pipe_m,
                 frame_source=ArrayFrameSource(frames_in), frame_sink=sink_mesh)

    assert s1["frames_written"] == s2["frames_written"] == 14
    assert s1["windows"] == s2["windows"] == 1
    a = np.stack(sink_single.frames).astype(np.int32)
    b = np.stack(sink_mesh.frames).astype(np.int32)
    assert np.abs(a - b).max() <= 1

    # multi-window sharded smoke: overlap carry + color match + blend chain
    # across 3 lockstep windows on the mesh (equality is chaos-limited, see
    # docstring) — counts and finiteness only
    frames_28 = (np.random.RandomState(15).rand(28, 64, 64, 3) * 255).astype(np.uint8)
    sink_multi = ArrayFrameSink()
    s3 = vid2vid(config=cfg_m, pipeline=pipe_m,
                 frame_source=ArrayFrameSource(frames_28), frame_sink=sink_multi)
    assert s3["frames_written"] == 28 and s3["windows"] == 3
    assert all(np.isfinite(np.asarray(f, np.float32)).all() for f in sink_multi.frames)


def test_mesh_params_cast_to_run_dtype(eight_devices):
    """Mesh-sharded param trees must get the same run-dtype cast as the
    single-chip commit path: shard_params returns committed jax.Arrays,
    which _commit_params passes through — without the host-side cast before
    sharding, multi-chip runs silently kept f32 weights (r3 review)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from controlanimate_tpu.pipelines.facade import ControlAnimatePipeline

    donor = tiny_pipeline(base_cfg())
    to_host = lambda tree: jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), tree
    )
    host_models = dataclasses.replace(
        donor.models,
        unet_params=to_host(donor.models.unet_params),
        vae_params=to_host(donor.models.vae_params),
        controlnet_params=[to_host(p) for p in donor.models.controlnet_params],
    )
    cfg_m = base_cfg(mesh_shape=(4, 2))  # dtype defaults to bfloat16
    pipe_m = ControlAnimatePipeline(cfg_m, models=host_models, text_stack=donor.text)
    assert pipe_m.mesh is not None
    for tree in (pipe_m.models.unet_params, pipe_m.models.vae_params):
        leaves = jax.tree_util.tree_leaves(tree)
        assert all(
            l.dtype == jnp.bfloat16 for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)
        )
        # and they are committed across the mesh, not host arrays
        assert all(isinstance(l, jax.Array) for l in leaves)
