"""Benchmarks on the product path (facade-constructed pipeline, the same
code `python main.py --config ...` drives). Full SD1.5-geometry AnimateDiff
UNet3D (motion modules v2) + VAE, bfloat16, single chip.

Emits JSON lines on stdout (diagnostics on stderr), headline LAST:
  1. the reference's default profile: 30-step Euler CFG 7.5, with the
     measured LCM speedup multiple (the reference README claims "10X");
  2. (best-effort) the same profile with opt-in encoder propagation
     (reuse_every=2) — acceleration headroom, with the measured
     approximation error (SSIM/PSNR vs the exact run, same latents);
  3. (best-effort) MFU: analytic matmul+conv FLOPs per jitted program over
     measured device time, vs the v5e bf16 peak (197 TFLOP/s);
  4. the shipped-profile configuration: overlap-8 sliding windows through
     the FULL orchestrator (scripts/vid2vid.py) at frame_count 24,
     counting only frames actually emitted to the sink — warm pass
     measured twice (best), with per-window deltas + cache-miss counts +
     phase timers on stderr;
  5. headline (driver metric, BASELINE.json): LCM vid2vid frames/sec/chip,
     512px 16-frame window, 4 steps. North star >=10 (vs_baseline = /10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

REPO = Path(__file__).resolve().parent
CACHE_DIR = REPO / ".jax_cache"
CACHE_SEED = REPO / "scripts" / "bench_cache.tar.gz"  # legacy fallback
SEED_DIR = REPO / "scripts" / "bench_cache"  # content-addressed per-entry seed
MANIFEST = REPO / "scripts" / "bench_cache_manifest.json"


def _seed_cache():
    """Populate the compile cache on a fresh checkout so cold start pays
    cache loads, not XLA compiles (VERDICT r2 #2). Preferred seed is the
    content-addressed per-entry directory scripts/bench_cache/ (VERDICT r3
    #7: refreshes only touch changed programs instead of re-committing a
    half-GB tarball); the legacy tarball is honored when the directory is
    absent."""
    if any(CACHE_DIR.glob("*")):
        return
    CACHE_DIR.mkdir(exist_ok=True)
    seeded = None
    if SEED_DIR.is_dir() and any(SEED_DIR.glob("*-cache")):
        for p in SEED_DIR.glob("*-cache"):
            shutil.copyfile(p, CACHE_DIR / p.name)
        seeded = f"{SEED_DIR.name}/ ({len(list(CACHE_DIR.glob('*-cache')))} entries)"
    elif CACHE_SEED.exists():
        import tarfile

        with tarfile.open(CACHE_SEED, "r:gz") as tf:
            tf.extractall(CACHE_DIR)
        seeded = CACHE_SEED.name
    if seeded:
        print(
            f"seeded compile cache from {seeded}; the per-section cache-miss "
            "counts printed below are the ground truth for how much of the "
            "seed still matches the current programs (0 misses = fully "
            "warm; any code change to a program's jaxpr invalidates its "
            "entry). The committed seed covers the headline path (init + "
            "first window + sustained loop); Euler/overlap8 sections may "
            "compile on a fresh checkout — their metrics are warm-pass "
            "timings, unaffected. Note the remote-attach TPU tunnel adds a "
            "session-start warmup to the FIRST program loads that varies "
            "from ~50s to several minutes depending on adjacency to the "
            "previous session; later loads in the same session run at full "
            "speed.",
            file=sys.stderr,
        )


class SectionTracker:
    """Attribute every compile-cache entry to the bench section that first
    loads (or freshly compiles) it. Ground truth for the committed seed
    (scripts/pack_seed.py): the repo filesystem mounts relatime, so after
    resetting every entry's atime below its mtime, the first read this run
    bumps atime — no heuristics about mount options or session cutoffs
    (ADVICE r3: the old atime>mtime+1 / 6h-window packer silently broke on
    noatime mounts and across fast cycles)."""

    _EPOCH = 1.0  # sentinel atime: anything above this means "touched"

    def __init__(self):
        self.sections: dict[str, str] = {}
        self.order: list[str] = []
        for p in CACHE_DIR.glob("*-cache"):
            st = p.stat()
            os.utime(p, times=(self._EPOCH, st.st_mtime))

    def mark(self, section: str) -> None:
        if section not in self.order:
            self.order.append(section)
        for p in CACHE_DIR.glob("*-cache"):
            if p.name in self.sections:
                continue
            if p.stat().st_atime > self._EPOCH + 1:
                self.sections[p.name] = section

    def dump(self) -> None:
        entries = {}
        for name, sec in sorted(self.sections.items()):
            p = CACHE_DIR / name
            if p.exists():
                entries[name] = {"section": sec, "bytes": p.stat().st_size}
        MANIFEST.write_text(
            json.dumps({"section_order": self.order, "entries": entries}, indent=1)
            + "\n"
        )
        log(
            f"wrote {MANIFEST.name}: {len(entries)} entries read this run "
            f"({sum(e['bytes'] for e in entries.values()) / 1e6:.0f} MB); "
            "scripts/pack_seed.py turns this into the committed seed"
        )


CACHE_DIR.mkdir(exist_ok=True)
_seed_cache()
# persistent compilation cache: verified to work through the remote-compile
# tunnel (second run skips the ~180s compile)
jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from controlanimate_tpu.config import RunConfig
from controlanimate_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from controlanimate_tpu.models.tokenizer import CLIPTokenizer
from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from controlanimate_tpu.models.vae import AutoencoderKL
from controlanimate_tpu.pipelines.engine import EngineModels
from controlanimate_tpu.pipelines.facade import ControlAnimatePipeline, TextStack


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pipeline(cfg: RunConfig) -> ControlAnimatePipeline:
    """Facade pipeline with the flagship model geometry and random weights
    (checkpoints are absent in the bench environment; weight VALUES don't
    affect step time)."""
    dtype = jnp.bfloat16
    # full SD1.5 + LCM cond + motion v2; run-level program knobs (ToMe)
    # bake in like the facade's disk build does
    ucfg = UNet3DConfig(
        time_cond_proj_dim=256,
        token_merge_ratio=float(cfg.token_merge_ratio or 0.0),
        token_merge_motion=bool(cfg.token_merge_motion),
        token_merge_min_tokens=int(cfg.token_merge_min_tokens),
    )
    unet = UNet3DConditionModel(ucfg, dtype=dtype)
    vae = AutoencoderKL(dtype=dtype)

    key = jax.random.PRNGKey(0)
    unet_params = jax.jit(
        lambda k: unet.init(
            k,
            jnp.zeros((1, 2, 8, 8, 4), dtype),
            jnp.asarray([1]),
            jnp.zeros((1, 77, 768), dtype),
            timestep_cond=jnp.zeros((1, 256), dtype),
        )["params"]
    )(key)
    vae_params = jax.jit(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), dtype))["params"]
    )(key)
    # params live in bf16 on device, matching the product path (the facade
    # casts disk-loaded float params to the run dtype at commit) — halves
    # the per-step HBM weight reads vs f32 init params
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype in (jnp.float32, jnp.float64) else x, t
    )
    unet_params, vae_params = cast(unet_params), cast(vae_params)
    jax.block_until_ready(unet_params)

    # full-width CLIP text stack (SD1.5 geometry), tiny BPE vocab
    tok = CLIPTokenizer.tiny()
    tcfg = CLIPTextConfig(
        vocab_size=len(tok.vocab), hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, eos_token_id=tok.eos_token_id,
    )
    tmodel = CLIPTextModel(tcfg, dtype=dtype)
    tparams = cast(tmodel.init(key, jnp.zeros((1, 77), jnp.int32))["params"])

    models = EngineModels(unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params)
    return ControlAnimatePipeline(cfg, models=models, text_stack=TextStack(tok, tmodel, tparams))


def measure_euler(pipeline, frames=16, size=512, steps=30, reuse=0):
    """The reference's default profile (SampleConfig: 30-step Euler, CFG
    7.5): frames/sec through the engine's denoise+decode programs.
    reuse>1 additionally engages encoder propagation (arXiv:2312.09608,
    RunConfig.encoder_reuse_every) — full UNet every `reuse`-th step.

    Returns (fps, denoise_seconds, decoded_frames): the denoise-only device
    time feeds the MFU line, and the decoded window feeds the approximation
    -error measurement (VERDICT r3 next #8) when reuse>1."""
    from controlanimate_tpu.pipelines.engine import WindowStatic

    eng = pipeline.engine
    st = WindowStatic(
        scheduler_name="EulerDiscreteScheduler", steps=steps, guidance_scale=7.5,
        strength=1.0, frame_count=frames, height=size, width=size, output_uint8=True,
        encoder_reuse_every=int(reuse),
    )
    sched = eng.build_scheduler(st)
    denoise = eng._make_denoise_fn(st, sched)
    decode = eng._make_decode_fn(True)
    key = jax.random.PRNGKey(0)
    d_ctx = eng.m.unet.config.cross_attention_dim
    text = jax.random.normal(key, (2, 77, d_ctx), jnp.bfloat16)
    lat = jax.random.normal(key, (1, frames, size // 8, size // 8, 4), jnp.float32)

    def window(lat):
        # denoise and decode timed separately (two host readbacks; the
        # extra sync is ~2 dispatch floors ≈ 50ms on an 11s window) so the
        # MFU line can attribute device time per program
        t0 = time.time()
        lat2 = denoise(eng.m.unet_params, (), text, (), lat, key)
        float(lat2.astype(jnp.float32).sum())
        t_den = time.time() - t0
        out = decode(eng.m.vae_params, lat2)
        float(out.astype(jnp.float32).sum())
        return out, t_den

    out, _ = window(lat)  # compile + warmup
    times, den_times = [], []
    for _ in range(2):
        t0 = time.time()
        out, t_den = window(lat)
        times.append(time.time() - t0)
        den_times.append(t_den)
    t = min(times)
    log(f"euler {steps}-step window: {t:.2f}s -> {frames / t:.2f} fps "
        f"(denoise {min(den_times):.2f}s)")
    return frames / t, min(den_times), np.asarray(out)


def measure_mfu(pipeline, frames, size, window_s, euler_denoise_s):
    """MFU per jitted program (VERDICT r3 weak #5): analytic matmul+conv
    FLOPs (utils/flops.py jaxpr walk — exact for these statically-shaped
    programs) divided by measured device time, against the v5e bf16 peak.
    Addresses the engine's ALREADY-COMPILED programs via the facade's exact
    WindowStatic key, so this section adds timing dispatches but zero
    compiles."""
    from controlanimate_tpu.pipelines.engine import WindowStatic
    from controlanimate_tpu.utils.flops import PEAK_BF16_TFLOPS, count_flops, mfu

    eng = pipeline.engine
    st = pipeline.window_static(overlaps=0, has_input_frames=True)
    sched = eng.build_scheduler(st)
    prepare = eng._make_prepare_fn(st, sched)
    denoise = eng._make_denoise_fn(st, sched)
    decode = eng._make_decode_fn(st.output_uint8, st.decode_chunk)

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(3)
    frames_in = jnp.asarray((rng.rand(1, frames, size, size, 3) * 255).astype(np.uint8))
    d_ctx = eng.m.unet.config.cross_attention_dim
    text = jax.random.normal(key, (1, 77, d_ctx), jnp.bfloat16)
    latent_shape = (1, frames, size // 8, size // 8, 4)

    def timed(fn, *args, iters=3):
        out = fn(*args)  # program-cache warm; no compile expected
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        times = []
        for _ in range(iters):
            t0 = time.time()
            out = fn(*args)
            float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
            times.append(time.time() - t0)
        return out, min(times)

    lat, t_prep = timed(prepare, eng.m.vae_params, frames_in, None, latent_shape, key)
    lat_d = lat[0] if st.tail_latents else lat
    _, t_den = timed(denoise, eng.m.unet_params, (), text, (), lat_d, key)
    _, t_dec = timed(decode, eng.m.vae_params, lat_d)

    # FLOP counts: pure host-side traces, no device work
    f_prep = count_flops(prepare, eng.m.vae_params, frames_in, None, latent_shape,
                         key, static_argnums=(3,))
    f_den = count_flops(denoise, eng.m.unet_params, (), text, (), lat_d, key)
    f_dec = count_flops(decode, eng.m.vae_params, lat_d)

    st_e = WindowStatic(
        scheduler_name="EulerDiscreteScheduler", steps=30, guidance_scale=7.5,
        strength=1.0, frame_count=frames, height=size, width=size, output_uint8=True,
    )
    denoise_e = eng._make_denoise_fn(st_e, eng.build_scheduler(st_e))
    text2 = jax.random.normal(key, (2, 77, d_ctx), jnp.bfloat16)
    f_den_e = count_flops(denoise_e, eng.m.unet_params, (), text2, (), lat_d, key)

    def row(fl, t):
        return {"tflop": round(fl / 1e12, 2), "ms": round(t * 1e3, 1),
                "mfu": round(mfu(fl, t), 3)}

    per = {
        f"prepare (vae encode, {frames}f)": row(f_prep, t_prep),
        f"denoise (LCM {st.steps} steps, {frames}f)": row(f_den, t_den),
        f"decode ({frames}f -> u8)": row(f_dec, t_dec),
        f"denoise (Euler 30 steps CFG, {frames}f)": row(f_den_e, euler_denoise_s),
    }
    for name, r in per.items():
        log(f"MFU {name}: {r['tflop']} TFLOP / {r['ms']} ms -> {r['mfu']:.1%}")
    window = row(f_prep + f_den + f_dec, window_s)
    print(
        json.dumps(
            {
                "metric": "MFU (analytic matmul+conv FLOPs / measured device time; 2 FLOPs per MAC; v5e bf16 peak 197 TFLOP/s)",
                "value": per[f"denoise (LCM {st.steps} steps, {frames}f)"]["mfu"],
                "unit": "fraction of peak (headline = LCM denoise program)",
                "per_program": per,
                "sustained_window": {
                    **window,
                    "note": "all three programs' FLOPs over the per-window wall time of the pipelined facade loop (includes stitch/yuv/transfers)",
                },
            }
        ),
        flush=True,
    )


def measure_overlap8(pipeline, frames=24, size=512, windows=16, overlap=8) -> float:
    """The shipped-profile configuration through the FULL orchestrator
    (scripts/vid2vid.py: prefetch thread, fused stitch, deferred emit),
    in-memory IO, counting only frames emitted to the sink. With overlap 8 a
    24-frame window emits 16 novel frames (VERDICT r2 #3; the v2 motion PE
    table allows up to 32).

    16 windows per pass (r4; was 8): the pipelined loop pays a one-time
    fill (~2s: window-0's chain completes before the first deferred emit
    can flush) and drain (~0.4s: the tail flush has no next window to hide
    behind), which at 8 windows depressed the average ~10% below the
    steady-state rate a real-length video sees (VERDICT r3 weak #1 — the
    r3 capture's 7.47 vs 10.4 gap was this tax plus a stale cache seed).
    The steady-state rate over the middle windows is reported alongside so
    fill/drain vs per-window regressions are separable in the artifact."""
    import tempfile

    from controlanimate_tpu.io.media import ArrayFrameSink, ArrayFrameSource
    from controlanimate_tpu.pipelines.facade import ControlAnimatePipeline
    from scripts.vid2vid import vid2vid

    novel = frames - overlap
    total = frames + (windows - 1) * novel
    rng = np.random.RandomState(1)
    frames_in = (rng.rand(total, size, size, 3) * 255).astype(np.uint8)

    class YuvSink(ArrayFrameSink):
        # the shipped profile emits I420 to x264 (sink_pix_fmt yuv420p when
        # ffmpeg is present); matching it here halves the per-window readback
        # vs rgb24 — on slow tunnel sessions the emit fetch is what bounds
        # the orchestrator (bench_r4c: upscale_and_emit 2991 vs 1693 ms/window
        # for the same binary, device timings identical)
        pix_fmt = "yuv420p"

    def run(tag, pipe, cfg):
        """One orchestrator pass with the diagnostics VERDICT r3 weak #1
        asked for: per-window wall deltas, section cache-miss count, and the
        orchestrator's own phase timers — a slow capture is diagnosable from
        the artifact alone (compiles vs host stalls vs tunnel warmup)."""
        sink = YuvSink()
        ticks = []
        before = {p.name for p in CACHE_DIR.glob("*-cache")}
        t0 = time.time()
        s = vid2vid(config=cfg, pipeline=pipe,
                    frame_source=ArrayFrameSource(frames_in), frame_sink=sink,
                    progress=lambda info: ticks.append(time.time()))
        wall = time.time() - t0
        new = [p for p in CACHE_DIR.glob("*-cache") if p.name not in before]
        dl = [b - a for a, b in zip([t0] + ticks, ticks)]
        deltas = " ".join(f"{d:.2f}" for d in dl)
        fps = s["frames_written"] / wall
        # steady-state rate: middle windows only. Ticks are [window-0
        # (async dispatch, ~0), window-1 (pipeline fill: the first deferred
        # emit blocks on the whole first chain), mid windows..., final
        # converge tick (drain: tail flush + overlap emit)] — drop the
        # first two and the last
        mid = dl[2:-1]
        steady = (frames - overlap) * len(mid) / sum(mid) if len(mid) >= 2 else fps
        log(f"overlap8 {tag}: {s['frames_written']} frames / {s['windows']} windows "
            f"in {wall:.1f}s -> {fps:.2f} emitted fps "
            f"(steady-state {steady:.2f} over {len(mid)} mid windows)")
        log(f"overlap8 {tag} per-window deltas (s): {deltas} | cache misses: {len(new)}")
        log(f"overlap8 {tag} phase timers: {json.dumps(s.get('timers', {}))}")
        assert len(sink.frames) == total
        return fps, steady

    with tempfile.TemporaryDirectory() as td:
        cfg = pipeline.config.replace(
            frame_count=frames, overlap_length=overlap, overlap_strength=0.9,
            output_video_dir=td, checkpoint_interval=0,
        )
        pipe = ControlAnimatePipeline(cfg, models=pipeline.models, text_stack=pipeline.text)
        run("cold", pipe, cfg)
        # steady-state throughput is the claim; a single warm pass is still
        # exposed to tunnel-session tails (r3: 13.5s vs 18.2s for the same
        # binary 33 min apart — perf/overlap8_capture_r3.json), so measure
        # twice and report the best
        results = [run(f"warm{i}", pipe, cfg) for i in range(2)]
        fps = max(r[0] for r in results)
        steady = max(r[1] for r in results)
    return fps, steady


class DeviceClaimError(RuntimeError):
    """Raised when the TPU pool claim itself fails (vs. a bench-code error)."""


def _claim_device(attempts: int = 2, cooldown_s: int = 120):
    """jax.devices() with ONE bounded retry: the axon pool claim can block
    ~25 min and then raise UNAVAILABLE when no chip is free (seen 8/18); on
    a transient outage a retry saves the whole bench artifact from being a
    traceback. Bounded so a hard outage still fails within ~1h."""
    for i in range(attempts):
        try:
            return jax.devices()[0]
        except RuntimeError as e:
            if i == attempts - 1:
                raise DeviceClaimError(str(e)) from e
            log(f"device claim failed ({e}); retrying in {cooldown_s}s")
            try:
                from jax._src import xla_bridge as _xb

                _xb._clear_backends()  # drop the cached init failure
            except Exception:
                pass
            time.sleep(cooldown_s)


def main(frames: int = 16, size: int = 512, steps: int = 4, iters: int = 16):
    dev = _claim_device()
    log(f"device: {dev}")

    cfg = RunConfig(
        width=size, height=size, frame_count=frames, overlap_length=8,
        use_lcm=True, steps=steps, guidance_scale=7.5, strength=0.9,
        lcm_origin_steps=50, prompt="a cat, masterpiece", n_prompt="blurry",
        seed=7, dtype="bfloat16",
    )

    tracker = SectionTracker()
    t0 = time.time()
    pipeline = build_pipeline(cfg)
    log(f"init: {time.time() - t0:.1f}s")
    tracker.mark("init")

    rng = np.random.RandomState(0)
    # distinct per-window frame stacks (a real stream never repeats bytes)
    inputs = [
        (rng.rand(frames, size, size, 3) * 255).astype(np.uint8) for _ in range(3)
    ]

    cache_before = {p.name for p in CACHE_DIR.glob("*-cache")}
    t0 = time.time()
    out = pipeline.animate(inputs[0], None, overlaps=0, seed=cfg.seed)
    assert out.shape == (frames, size, size, 3) and out.dtype == np.uint8
    first_window = time.time() - t0
    # distinguish real XLA compiles from the tunnel's session-start warmup:
    # every *-cache file written during the first window is a program the
    # seeded cache did NOT cover (ledger: warm-adjacent sessions load the
    # same fully-seeded programs in ~50s; several-minutes-idle sessions take
    # 4-15x that for identical zero-miss loads)
    new = [p for p in CACHE_DIR.glob("*-cache") if p.name not in cache_before]
    log(
        f"compile + first window: {first_window:.1f}s "
        f"(cache misses this window: {len(new)}, "
        f"{sum(p.stat().st_size for p in new) / 1e6:.1f} MB compiled fresh "
        f"of {sum(p.stat().st_size for p in CACHE_DIR.glob('*-cache')) / 1e6:.0f} MB total "
        "-- remainder of the time is tunnel session warmup, not compilation)"
    )
    tracker.mark("first_window")

    # sustained throughput with the production pipelining: host->device of
    # window N+1 overlaps window N's compute and the emitted frames leave as
    # device-converted yuv420p (exactly what scripts/vid2vid.py feeds x264)
    from concurrent.futures import ThreadPoolExecutor

    from controlanimate_tpu.ops.stitch import stitch_window

    def run_window(x_dev):
        # the orchestrator's fused stitch program (here with no anchors:
        # slices + yuv pack in one dispatch, exactly the product's window 0)
        out = pipeline.animate_async(x_dev, None, overlaps=0, seed=cfg.seed)
        packed, _, _, _ = stitch_window(
            out, None, None, overlap_length=0, to_yuv=True, emit=frames
        )
        return packed

    ex = ThreadPoolExecutor(max_workers=2)
    staged = ex.submit(jnp.asarray, inputs[0])
    # two pipelined warmup windows: compile the yuv program, settle device
    # allocator + tunnel caches (window 0 otherwise runs ~0.2s slow)
    for w in range(2):
        x_dev = staged.result()
        staged = ex.submit(jnp.asarray, inputs[(w + 1) % len(inputs)])
        np.asarray(run_window(x_dev))

    prev = None
    t0 = time.time()
    for i in range(iters):
        x_dev = staged.result()
        staged = ex.submit(jnp.asarray, inputs[i % len(inputs)])
        out_dev = run_window(x_dev)
        if prev is not None:
            assert np.asarray(prev).dtype == np.uint8  # fetch of window i-1
        prev = out_dev
        log(f"window {i} dispatched; elapsed {time.time() - t0:.2f}s")
    np.asarray(prev)
    total = time.time() - t0
    ex.shutdown(wait=False)
    fps = frames * iters / total
    log(f"sustained: {iters} windows in {total:.2f}s")
    tracker.mark("sustained")

    # secondary metrics (VERDICT r2 #3/#5), headline stays the LAST line.
    # The exact-numerics baseline prints BEFORE the reuse attempt: the
    # reuse run compiles a new denoise program, and a tunnel stall there
    # must not lose the already-measured baseline.
    fps_euler, t_den_euler, frames_exact = measure_euler(pipeline, frames=frames, size=size)
    tracker.mark("euler")
    print(
        json.dumps(
            {
                "metric": f"Euler 30-step CFG 7.5 frames/sec/chip ({size}px, {frames}-frame window; reference default profile)",
                "value": round(fps_euler, 3),
                "unit": "frames/sec/chip",
                "lcm_speedup_multiple": round(fps / fps_euler, 1),
                "reference_claim": "10X (README.md:16)",
            }
        ),
        flush=True,
    )
    try:
        # opt-in encoder propagation on the same profile (exact numerics
        # stay the line above; this shows the acceleration headroom).
        # Guarded: a failure here must not sink the cache-rebuilding bench.
        fps_reuse, _, frames_approx = measure_euler(pipeline, frames=frames, size=size, reuse=2)
        # approximation error vs the exact run (VERDICT r3 next #8): both
        # runs decode the SAME latents/text/key, so frame-wise SSIM/PSNR
        # isolates the encoder-propagation error exactly
        from scripts.eval_quality import psnr, ssim

        pairs = list(zip(frames_exact[0], frames_approx[0]))
        err_ssim = float(np.mean([ssim(a, b) for a, b in pairs]))
        err_psnr = float(np.mean([psnr(a, b) for a, b in pairs]))
        print(
            json.dumps(
                {
                    "metric": f"Euler 30-step with encoder propagation (reuse_every=2, arXiv:2312.09608; opt-in approximation, same window)",
                    "value": round(fps_reuse, 3),
                    "unit": "frames/sec/chip",
                    "speedup_vs_exact_euler": round(fps_reuse / fps_euler, 2),
                    "approx_error_vs_exact": {
                        "mean_frame_ssim": round(err_ssim, 4),
                        "mean_frame_psnr_db": round(err_psnr, 2),
                        "note": "same latents/text/seed, identical decode; differences are solely the reused encoder features. RANDOM weights make this an adversarial WORST CASE: the paper's premise (encoder features evolve slowly across steps) holds for trained UNets, not random ones — with a real checkpoint, measure via scripts/eval_quality.py before shipping reuse_every",
                    },
                }
            ),
            flush=True,
        )
    except Exception as e:  # pragma: no cover - chip-only path
        log(f"euler encoder-reuse measurement failed: {e!r}")
    tracker.mark("euler_reuse")
    try:
        measure_mfu(pipeline, frames=frames, size=size,
                    window_s=total / iters, euler_denoise_s=t_den_euler)
    except Exception as e:  # pragma: no cover - chip-only path
        log(f"MFU measurement failed: {e!r}")
    tracker.mark("mfu")
    fps_o8, steady_o8 = measure_overlap8(pipeline, frames=24, size=size)
    print(
        json.dumps(
            {
                "metric": f"overlap-8 emitted frames/sec/chip ({size}px, 24-frame windows, full orchestrator, LCM {steps} steps)",
                "value": round(fps_o8, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps_o8 / 10.0, 3),
                "windows_per_pass": 16,
                "steady_state_fps": round(steady_o8, 3),
                "note": "value = whole-pass average incl. pipeline fill/drain; steady_state_fps = middle windows only, the rate a long video sustains",
            }
        ),
        flush=True,
    )
    tracker.mark("overlap8")
    # RealESRGAN x4: every shipped LCM profile runs upscale 4 (reference
    # SampleConfigLCM*.yaml `upscale: 4`). Standalone per-frame rate of the
    # device-u8 RRDB program at run geometry — the e2e upscale-4 pass is
    # d2h-link-bound through the remote tunnel (perf/linkprobe_r4.json), so
    # the device rate is the production-relevant number. Guarded: a failure
    # must not sink the bench.
    try:
        from controlanimate_tpu.models.upscaler import Upscaler
        from scripts.tpu_perf import _synth_rrdb_ckpt

        ups = Upscaler(4.0, model_path=_synth_rrdb_ckpt(), num_block=6,
                       dtype=jnp.bfloat16)
        sumf = jax.jit(lambda t: t.astype(jnp.float32).sum())
        # product shape: the orchestrator hands the upscaler a window's
        # novel frames at once; the two-program split (s2d body + pallas
        # im2col tail, perf/upconv_r5.json) amortizes its launch floors
        # over the batch
        nb = 8
        xu = jnp.asarray(
            (np.random.RandomState(3).rand(nb, size, size, 3) * 255
             ).astype(np.uint8))
        float(sumf(ups.upscale_batch_device(xu)))  # compile + warm
        best = 1e9
        for _ in range(3):
            t1 = time.time()
            float(sumf(ups.upscale_batch_device(xu)))
            best = min(best, time.time() - t1)
        print(
            json.dumps(
                {
                    "metric": f"RealESRGAN x4 RRDB (anime_6B geometry) device ms/frame ({size}->{4 * size}px, bf16, s2d body + pallas up-stage, batch {nb})",
                    "value": round(best * 1000 / nb, 1),
                    "unit": "ms/frame",
                    "note": "synthetic weights at checkpoint geometry; the pallas im2col up-stage runs in its own program (same-program mixing poisons body layouts) — A/B + traces in perf/upconv_r5.json (77.3 split vs 83.1 XLA vs 106.6 r4)",
                }
            ),
            flush=True,
        )
    except Exception as e:  # pragma: no cover - chip-only path
        log(f"upscaler measurement failed: {e!r}")
    tracker.mark("upscaler")
    # quality line (VERDICT r4 next #7): numerics in the same artifact the
    # driver reads for perf. Runs in a CPU subprocess (torch oracle + tiny
    # engine programs; the chip session pays nothing). Guarded.
    try:
        import subprocess

        q = subprocess.run(
            [sys.executable, str(Path(__file__).parent / "scripts" / "quality_smoke.py")],
            capture_output=True, text=True, timeout=900, check=True,
        )
        print(
            json.dumps(
                {
                    "metric": "quality (engine-vs-torch-oracle golden SSIM + FVD pipeline smoke; CPU subprocess)",
                    "value": json.loads(q.stdout)["engine_vs_torch_oracle"]["mean_frame_ssim"],
                    "unit": "mean frame SSIM vs oracle (1.0 = exact)",
                    **json.loads(q.stdout),
                }
            ),
            flush=True,
        )
    except Exception as e:  # pragma: no cover
        log(f"quality smoke failed: {e!r}")
    tracker.mark("quality")
    try:
        tracker.dump()
    except Exception as e:  # pragma: no cover
        log(f"manifest dump failed: {e!r}")
    print(
        json.dumps(
            {
                "metric": f"LCM vid2vid frames/sec/chip ({size}px, {frames}-frame window, {steps} steps, facade path)",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / 10.0, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kw[k] = int(v)
    try:
        main(**kw)
    except DeviceClaimError as e:
        # a hard pool outage (claim retry exhausted) should leave a concise,
        # unambiguous artifact — not a traceback, and not a fake 0-fps line.
        # Only claim-time failures take this path; a RuntimeError later in
        # the bench (a real code/compile regression) keeps its traceback.
        print(
            f"BENCH ABORTED: TPU device claim failed after retry ({e})",
            file=sys.stderr,
        )
        sys.exit(2)
