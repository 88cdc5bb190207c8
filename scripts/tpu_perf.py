"""One-session TPU performance sweep (the axon tunnel dislikes repeated
short sessions, so all measurements batch into one process).

Usage: python scripts/tpu_perf.py [attn] [unet] [vae] [window]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def yuv_sink():
    """In-memory sink taking the product's I420 payload (pix_fmt yuv420p,
    what the ffmpeg path feeds x264) — half the per-window d2h of rgb24.
    All orchestrator-fps sections use this so their numbers are comparable
    with bench.py's overlap-8 line (which switched with the r4 emit-path
    fix; earlier artifacts measured the heavier rgb24 readback)."""
    from controlanimate_tpu.io.media import ArrayFrameSink

    class _YuvArraySink(ArrayFrameSink):
        pix_fmt = "yuv420p"

    return _YuvArraySink()


def timeit(name, fn, *args, iters=3):
    t0 = time.time()
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # force real completion via host readback (tunnel's block_until_ready
    # returns early)
    float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    log(f"{name} compile+first: {time.time()-t0:.1f}s")
    times = []
    for i in range(iters):
        t0 = time.time()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        times.append(time.time() - t0)
    best = min(times)
    log(f"{name} best: {best*1000:.2f} ms")
    return best


def bench_attention():
    from controlanimate_tpu.ops.flash_attention import flash_attention

    for (B, N, H, D) in [(16, 4096, 8, 40), (16, 1024, 8, 80), (32, 4096, 8, 40)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, N, H, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, N, H, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, N, H, D), jnp.bfloat16)
        log(f"--- attention shape {(B, N, H, D)}")
        xla = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v))
        timeit("  xla_fused", xla, q, k, v)
        pallas = jax.jit(lambda q, k, v: flash_attention(q, k, v))
        timeit("  pallas_flash", pallas, q, k, v)
        try:
            import math

            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as stock_flash,
            )

            def stock(q, k, v):
                # stock kernel layout: (B, H, N, D)
                qt = q.transpose(0, 2, 1, 3)
                kt = k.transpose(0, 2, 1, 3)
                vt = v.transpose(0, 2, 1, 3)
                o = stock_flash(qt, kt, vt, sm_scale=1.0 / math.sqrt(q.shape[-1]))
                return o.transpose(0, 2, 1, 3)

            timeit("  stock_flash", jax.jit(stock), q, k, v)
        except Exception as e:
            log(f"  stock_flash unavailable: {e}")


def bench_attn_blocks():
    """Block-size autotune for the v2 flash kernel at the UNet's hot spatial
    shapes, vs the XLA fused baseline (which materializes NxN logits in HBM)."""
    from controlanimate_tpu.ops.flash_attention import flash_attention

    for (B, N, H, D) in [(16, 4096, 8, 40), (32, 4096, 8, 40), (16, 1024, 8, 80)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, N, H, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, N, H, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, N, H, D), jnp.bfloat16)
        log(f"--- attention shape {(B, N, H, D)}")
        xla = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v))
        timeit("  xla_fused", xla, q, k, v)
        for bq in (256, 512, 1024):
            for bk in (1024, 2048, N):
                if bq > N or bk > N:
                    continue
                fn = jax.jit(
                    lambda q, k, v, bq=bq, bk=bk: flash_attention(
                        q, k, v, block_q=bq, block_k=bk
                    )
                )
                timeit(f"  pallas bq={bq} bk={bk}", fn, q, k, v)


def bench_attn_loop():
    """Per-call attention time resolved below the dispatch floor: chain the
    call x10 inside ONE jit (output feeds back as q)."""
    from controlanimate_tpu.ops.flash_attention import flash_attention

    REPS = 10
    for (B, N, H, D) in [(16, 4096, 1, 512), (16, 4096, 8, 40), (16, 1024, 8, 80), (32, 1024, 8, 80), (16, 256, 8, 160)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, N, H, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, N, H, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, N, H, D), jnp.bfloat16)
        log(f"--- attention loop shape {(B, N, H, D)} x{REPS}")

        def loop(fn):
            def run(q, k, v):
                def body(c, _):
                    return fn(c, k, v).astype(c.dtype), None
                out, _ = jax.lax.scan(body, q, None, length=REPS)
                return out
            return jax.jit(run)

        t = timeit("  xla_fused x10",
                   loop(lambda q, k, v: jax.nn.dot_product_attention(q, k, v)),
                   q, k, v)
        log(f"    => {t/REPS*1000:.2f} ms/call")
        for bq, bk in [(128, N), (256, N), (512, N), (512, 2048)]:
            t = timeit(
                f"  pallas bq={bq} bk={bk} x10",
                loop(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                    q, k, v, block_q=bq, block_k=bk)),
                q, k, v,
            )
            log(f"    => {t/REPS*1000:.2f} ms/call")


def bench_attn_xl():
    """One-pass flash kernel with XL q-blocks (fewer, fatter MXU launches)
    at the LCM spatial shape, vs XLA."""
    from controlanimate_tpu.ops.flash_attention import flash_attention

    REPS = 10
    B, N, H, D = 16, 4096, 8, 40
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, N, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, N, H, D), jnp.bfloat16)

    def loop(fn):
        def run(q, k, v):
            def body(c, _):
                return fn(c, k, v).astype(c.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=REPS)
            return out
        return jax.jit(run)

    t = timeit("  xla_fused x10",
               loop(lambda q, k, v: jax.nn.dot_product_attention(q, k, v)),
               q, k, v)
    log(f"    => {t/REPS*1000:.2f} ms/call")
    for bq in (1024, 2048, 4096):
        try:
            t = timeit(
                f"  pallas bq={bq} onepass x10",
                loop(lambda q, k, v, bq=bq: flash_attention(
                    q, k, v, block_q=bq, block_k=N)),
                q, k, v,
            )
            log(f"    => {t/REPS*1000:.2f} ms/call")
        except Exception as e:
            log(f"  pallas bq={bq} failed: {type(e).__name__}: {str(e)[:160]}")


def bench_conv_loop():
    """Fused GN+SiLU+conv3x3 Pallas kernel vs XLA at the VAE's hot
    geometries, chained x8 inside one jit."""
    from controlanimate_tpu.ops.conv_kernel import conv3x3_fused, conv3x3_xla

    REPS = 8
    for (B, HW, C) in [(16, 512, 128), (16, 512, 256), (16, 256, 512)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        x = jax.random.normal(ks[0], (B, HW, HW, C), jnp.bfloat16)
        kernel = (jax.random.normal(ks[1], (3, 3, C, C), jnp.bfloat16) * 0.02)
        bias = jax.random.normal(ks[2], (C,), jnp.bfloat16) * 0.1
        a = 1.0 + 0.05 * jax.random.normal(ks[3], (B, C), jnp.bfloat16)
        bb = 0.05 * jax.random.normal(ks[4], (B, C), jnp.bfloat16)
        log(f"--- conv geometry {(B, HW, HW, C)} x{REPS}")

        def loop(fn):
            def run(x):
                def body(c, _):
                    return fn(c).astype(c.dtype), None
                out, _ = jax.lax.scan(body, x, None, length=REPS)
                return out
            return jax.jit(run)

        t = timeit("  xla gn+silu+conv x8",
                   loop(lambda x: conv3x3_xla(x, kernel, bias, affine=(a, bb), act="silu")),
                   x)
        log(f"    => {t/REPS*1000:.2f} ms/call")
        for R in (None, 4, 8):
            try:
                t = timeit(
                    f"  pallas R={R} x8",
                    loop(lambda x, R=R: conv3x3_fused(
                        x, kernel, bias, affine=(a, bb), act="silu",
                        rows_per_block=R)),
                    x,
                )
                log(f"    => {t/REPS*1000:.2f} ms/call")
            except Exception as e:
                log(f"  pallas R={R} failed: {type(e).__name__}: {str(e)[:200]}")


def bench_denoise():
    """The engine's LCM denoise program (b1, 16f, 4 steps)."""
    import numpy as np

    import bench
    from controlanimate_tpu.pipelines.engine import WindowStatic

    cfg = bench.RunConfig(
        width=512, height=512, frame_count=16, overlap_length=8,
        use_lcm=True, steps=4, guidance_scale=7.5, strength=0.9,
        lcm_origin_steps=50, prompt="a cat", n_prompt="", seed=7,
        dtype="bfloat16",
    )
    st = WindowStatic(
        steps=4, use_lcm=True, guidance_scale=7.5, strength=0.9,
        lcm_origin_steps=50, frame_count=16, height=512, width=512,
        output_uint8=True,
    )
    key = jax.random.PRNGKey(0)
    text = jax.random.normal(key, (1, 77, 768), jnp.bfloat16)
    lat = jax.random.normal(key, (1, 16, 64, 64, 4), jnp.float32)
    pipeline = bench.build_pipeline(cfg)
    eng = pipeline.engine
    sched = eng.build_scheduler(st)
    denoise = eng._make_denoise_fn(st, sched)
    timeit("denoise 4-step LCM", denoise,
           eng.m.unet_params, (), text, (), lat, key)


def bench_e2e_loop():
    """The FULL orchestrator loop on the real chip: scripts/vid2vid.py with
    the flagship models, overlap stitching (color match + blend), prefetch
    thread and state carry — in-memory IO, 6 windows. Validates the product
    path end-to-end at speed (the facade-loop bench skips the stitch state
    machine)."""
    import tempfile
    import numpy as np

    import bench
    from controlanimate_tpu.io.media import ArrayFrameSink, ArrayFrameSource
    from scripts.vid2vid import vid2vid

    with tempfile.TemporaryDirectory() as td:
        cfg = bench.RunConfig(
            width=512, height=512, frame_count=16, overlap_length=8,
            use_lcm=True, steps=4, guidance_scale=7.5, strength=0.9,
            overlap_strength=0.9, lcm_origin_steps=50, prompt="a cat",
            n_prompt="", seed=7, dtype="bfloat16", output_video_dir=td,
            upscale=1.0, checkpoint_interval=0,
        )
        pipeline = bench.build_pipeline(cfg)
        rng = np.random.RandomState(0)
        # 16 + 5*8 new frames -> 6 windows
        frames_in = (rng.rand(56, 512, 512, 3) * 255).astype(np.uint8)
        sink = yuv_sink()
        t0 = time.time()
        summary = vid2vid(
            config=cfg, pipeline=pipeline,
            frame_source=ArrayFrameSource(frames_in), frame_sink=sink,
        )
        wall = time.time() - t0
        log(f"e2e orchestrator: {summary['frames_written']} frames, "
            f"{summary['windows']} windows in {wall:.1f}s (incl. compile) -> "
            f"{summary['frames_written']/wall:.2f} fps cold; timers: "
            f"{summary['timers']}")
        assert summary["frames_written"] == 56, summary
        # steady-state: run again with everything compiled
        sink2 = yuv_sink()
        t0 = time.time()
        summary2 = vid2vid(
            config=cfg, pipeline=pipeline,
            frame_source=ArrayFrameSource(frames_in), frame_sink=sink2,
        )
        wall2 = time.time() - t0
        log(f"e2e orchestrator warm: {summary2['frames_written']} frames in "
            f"{wall2:.1f}s -> {summary2['frames_written']/wall2:.2f} fps "
            f"(16f windows emitting 8 novel frames each after window 0)")


def bench_segments():
    """Segment-parallel aggregate throughput on ONE chip: S video segments
    generated lockstep as one batched window program vs the sequential run
    over the same total frames. Wins come from dispatch/stitch amortization
    (~50ms/window overhead paid once for S segments) plus any MXU batch
    efficiency; the same batch axis shards over `data` on a mesh.

    NOTE S=2 at F=24 puts B*F=48 >= 32 on the denoise (flash-attn HBM rule
    kicks in; measured a wash at F=24 geometry) and chunks the decode at 24
    frames. The VAE *encode* in prepare runs all S*F frames unchunked —
    watch for RESOURCE_EXHAUSTED at S>=3."""
    import tempfile

    import numpy as np

    import bench
    from controlanimate_tpu.io.media import ArrayFrameSink, ArrayFrameSource
    from scripts.vid2vid import vid2vid

    F, ov, k = 24, 8, 8
    novel = F - ov
    per_seg = F + (k - 1) * novel  # 136 frames, 8 windows per segment:
    # enough mid-windows (5) for a steady-state number comparable to
    # bench.py's 16-window overlap-8 line
    base = bench.RunConfig(
        width=512, height=512, frame_count=F, overlap_length=ov,
        use_lcm=True, steps=4, guidance_scale=7.5, strength=0.9,
        overlap_strength=0.9, lcm_origin_steps=50, prompt="a cat", n_prompt="",
        seed=7, dtype="bfloat16", output_video_dir="/tmp/segbench",
        checkpoint_interval=0,
    )
    pipeline = bench.build_pipeline(base)
    for S in (1, 2):
        total = per_seg * S
        rng = np.random.RandomState(0)
        frames_in = (rng.rand(total, 512, 512, 3) * 255).astype(np.uint8)
        with tempfile.TemporaryDirectory() as td:
            cfg = base.replace(
                output_video_dir=td,
                parallel_segments=S if S > 1 else 0,
            )
            for tag in ("cold", "warm"):
                sink = yuv_sink()
                ticks = []
                t0 = time.time()
                s = vid2vid(config=cfg, pipeline=pipeline,
                            frame_source=ArrayFrameSource(frames_in),
                            frame_sink=sink,
                            progress=lambda info: ticks.append(time.time()))
                wall = time.time() - t0
                # steady-state like bench.py: drop the fill (first two ticks)
                # and the drain (last tick); report per-window deltas so the
                # artifact is diagnosable (VERDICT r4 weak #1: the r4 capture
                # measured the since-fixed synchronous-emit serialization)
                dl = [b - a for a, b in zip([t0] + ticks, ticks)]
                mid = dl[2:-1]
                steady = (novel * S * len(mid) / sum(mid)
                          if len(mid) >= 2 else s["frames_written"] / wall)
                log(f"segments S={S} {tag}: {s['frames_written']} frames / "
                    f"{s['windows']} windows in {wall:.1f}s -> "
                    f"{s['frames_written'] / wall:.2f} aggregate emitted fps "
                    f"(steady-state {steady:.2f} over {len(mid)} mid windows) "
                    f"| deltas {' '.join(f'{d:.2f}' for d in dl)}")
                assert s["frames_written"] == total, s


def bench_euler():
    """The reference's default profile (SampleConfig: 30-step Euler, CFG
    7.5, strength 1.0) through the engine programs — documents the measured
    LCM speedup ratio (reference README claims '10X')."""
    import numpy as np

    import bench
    from controlanimate_tpu.pipelines.engine import WindowStatic

    cfg = bench.RunConfig(
        width=512, height=512, frame_count=16, overlap_length=8,
        scheduler="EulerDiscreteScheduler", steps=30, guidance_scale=7.5,
        strength=1.0, prompt="a cat", n_prompt="", seed=7, dtype="bfloat16",
    )
    pipeline = bench.build_pipeline(cfg)
    eng = pipeline.engine
    st = WindowStatic(
        scheduler_name="EulerDiscreteScheduler", steps=30,
        guidance_scale=7.5, strength=1.0, frame_count=16, height=512,
        width=512, output_uint8=True,
    )
    sched = eng.build_scheduler(st)
    denoise = eng._make_denoise_fn(st, sched)
    decode = eng._make_decode_fn(True)
    key = jax.random.PRNGKey(0)
    text = jax.random.normal(key, (2, 77, 768), jnp.bfloat16)  # CFG pair
    lat = jax.random.normal(key, (1, 16, 64, 64, 4), jnp.float32)
    t = timeit("euler 30-step CFG denoise", denoise,
               eng.m.unet_params, (), text, (), lat, key, iters=2)
    lat2 = denoise(eng.m.unet_params, (), text, (), lat, key)
    t2 = timeit("decode", decode, eng.m.vae_params, lat2, iters=2)
    window = t + t2 + 0.17  # + prepare/stitch
    log(f"  => Euler profile ≈ {16/window:.2f} fps/chip "
        f"(LCM profile 15.1 → measured LCM speedup ≈ {15.1/(16/window):.1f}x)")

    # encoder propagation (arXiv:2312.09608, opt-in): non-key steps skip
    # conv_in/down/mid and run decoder-only against the key step's cache
    for reuse in (2, 3):
        st_r = dataclasses.replace(st, encoder_reuse_every=reuse)
        den_r = eng._make_denoise_fn(st_r, sched)
        tr = timeit(f"euler denoise [encoder-reuse n={reuse}]", den_r,
                    eng.m.unet_params, (), text, (), lat, key, iters=2)
        wr = tr + t2 + 0.17
        log(f"  => Euler+reuse{reuse} ≈ {16/wr:.2f} fps/chip "
            f"({t/tr:.2f}x denoise speedup vs full)")


def bench_motion_loop():
    """Frame-axis attention formulations, chained x10 inside one jit at the
    UNet level geometries (LCM batch). The einsum form batches 65k tiny
    (16x40)@(40x16) GEMMs; the mul-reduce form keeps everything on the VPU."""
    REPS = 10
    key = jax.random.PRNGKey(0)
    for (B, F, N, C) in [(1, 16, 4096, 320), (2, 16, 4096, 320), (1, 16, 1024, 640)]:
        H = 8
        D = C // H
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (B, F, N, C), jnp.bfloat16)
        wq = jax.random.normal(ks[1], (C, C), jnp.bfloat16) * 0.02
        wk = jax.random.normal(ks[2], (C, C), jnp.bfloat16) * 0.02
        wv = jax.random.normal(ks[3], (C, C), jnp.bfloat16) * 0.02
        wo = jax.random.normal(ks[4], (C, C), jnp.bfloat16) * 0.02
        log(f"--- motion loop geometry B{B} F{F} N{N} C{C} x{REPS}")

        def attn_einsum(x):
            q = (x @ wq).reshape(B, F, N, H, D)
            k = (x @ wk).reshape(B, F, N, H, D)
            v = (x @ wv).reshape(B, F, N, H, D)
            logits = jnp.einsum("bfnhd,bgnhd->bnhfg", q, k) * (D**-0.5)
            p = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
            out = jnp.einsum("bnhfg,bgnhd->bfnhd", p, v).reshape(B, F, N, C)
            return out @ wo

        def attn_mulreduce(x):
            q = (x @ wq).reshape(B, F, N, H, D)
            k = (x @ wk).reshape(B, F, N, H, D)
            v = (x @ wv).reshape(B, F, N, H, D)
            # logits[b,f,g,n,h] via broadcast-mul + d-reduce (VPU, no GEMM)
            logits = (
                q[:, :, None].astype(jnp.float32) * k[:, None].astype(jnp.float32)
            ).sum(-1) * (D**-0.5)  # (B,F,G,N,H)
            p = jax.nn.softmax(logits, axis=2)
            out = (p[..., None] * v[:, None].astype(jnp.float32)).sum(2)  # (B,F,N,H,D)
            return out.astype(x.dtype).reshape(B, F, N, C) @ wo

        def attn_projs_only(x):
            q = x @ wq
            k = x @ wk
            v = x @ wv
            return (q + k + v) @ wo

        def loop(fn):
            def run(x):
                def body(c, _):
                    return fn(c).astype(c.dtype), None
                out, _ = jax.lax.scan(body, x, None, length=REPS)
                return out
            return jax.jit(run)

        for name, fn in [("einsum(cur)", attn_einsum),
                         ("mulreduce", attn_mulreduce),
                         ("projs_only", attn_projs_only)]:
            t = timeit(f"  {name} x10", loop(fn), x)
            log(f"    => {t/REPS*1000:.2f} ms/call")


def bench_vae_fused():
    """Full VAE decode/encode with the fused conv kernel on vs off."""
    from controlanimate_tpu.models.vae import AutoencoderKL
    from controlanimate_tpu.ops import conv_kernel as ck

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))["params"]
    )(key)
    z = jax.random.normal(key, (16, 64, 64, 4), jnp.bfloat16)
    x = jax.random.normal(key, (16, 512, 512, 3), jnp.bfloat16)
    for fused in (False, True):
        ck.set_conv_kernel_enabled(fused)
        dec = jax.jit(lambda p, z: vae.apply({"params": p}, z, method=AutoencoderKL.decode))
        enc = jax.jit(lambda p, x: vae.apply({"params": p}, x, method=AutoencoderKL.encode))
        timeit(f"vae decode 16f 512px fused={fused}", dec, params, z)
        timeit(f"vae encode 16f 512px fused={fused}", enc, params, x)
    ck.set_conv_kernel_enabled(False)


def bench_unet():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    f = jax.jit(fn)
    best = timeit("unet3d fwd (CFG2 x 16f x 64x64lat)", f, *args, iters=5)
    log(f"  => per frame-eval: {best/32*1000:.1f} ms")


def bench_vae():
    from controlanimate_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))["params"])(key)
    z = jax.random.normal(key, (16, 64, 64, 4), jnp.bfloat16)
    dec = jax.jit(lambda p, z: vae.apply({"params": p}, z, method=AutoencoderKL.decode))
    timeit("vae decode 16f 512px", dec, params, z)
    x = jax.random.normal(key, (16, 512, 512, 3), jnp.bfloat16)
    enc = jax.jit(lambda p, x: vae.apply({"params": p}, x, method=AutoencoderKL.encode))
    timeit("vae encode 16f 512px", enc, params, x)


def bench_vae_ablate():
    """Where do the VAE decode milliseconds go?"""
    from controlanimate_tpu.models.vae import Decoder, VaeAttnBlock

    key = jax.random.PRNGKey(0)
    # mid attention alone: (16, 64, 64, 512) single head
    attn = VaeAttnBlock()
    x = jax.random.normal(key, (16, 64, 64, 512), jnp.bfloat16)
    p = attn.init(key, x)["params"]
    timeit("vae mid-attn 16f@64^2x512", jax.jit(lambda p, x: attn.apply({"params": p}, x)), p, x)

    # a single 512^2 x 128 conv stage (the top decoder level geometry)
    from flax import linen as nn

    conv = nn.Conv(128, (3, 3), padding=1, dtype=jnp.bfloat16)
    x2 = jax.random.normal(key, (16, 512, 512, 128), jnp.bfloat16)
    p2 = conv.init(key, x2)["params"]
    timeit("conv3x3 16f@512^2x128", jax.jit(lambda p, x: conv.apply({"params": p}, x)), p2, x2)


def bench_window():
    """Full LCM window via bench.py main()."""
    import bench

    bench.main(iters=8)


def bench_transfer():
    """Host<->device bandwidth + dispatch floor over this session's link
    (the facade moves ~25MB/window round trip at 512px/16f uint8)."""
    import numpy as np

    f = jax.jit(lambda x: x + 1)
    tiny = jnp.zeros((8,))
    float(f(tiny).sum())
    times = []
    for _ in range(10):
        t0 = time.time()
        float(f(tiny).sum())
        times.append(time.time() - t0)
    log(f"dispatch+readback floor: {min(times)*1000:.1f} ms")

    arr = np.random.randint(0, 255, (16, 512, 512, 3)).astype(np.uint8)
    s = jax.jit(lambda x: x.astype(jnp.float32).sum())
    x = jax.device_put(arr); float(s(x))  # warm the sum program
    for _ in range(3):
        t0 = time.time()
        x = jax.device_put(arr)
        float(s(x))
        log(f"h2d 12.6MB u8 (+sum readback): {(time.time()-t0)*1000:.1f} ms")
    for _ in range(3):
        t0 = time.time()
        np.asarray(x)
        log(f"d2h 12.6MB u8: {(time.time()-t0)*1000:.1f} ms")


def bench_linkprobe():
    """Does the link overlap d2h with device compute? The upscale-4 pass
    defers its ~107MB/window I420 fetch behind the next window's dispatch
    (vid2vid deferred emit); if the tunnel serializes transfer RPCs with
    compute RPCs the defer buys nothing and the pass is link-bound at the
    raw d2h rate. Measures: sustained d2h at the upscale-4 window payload,
    the same transfer concurrent with a ~seconds device compute loop (both
    orders), and h2d at the window input payload."""
    import numpy as np

    a = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.bfloat16)

    def loop(x, n=400):
        # sized ~2-3s so overlap against a multi-second transfer resolves
        def body(c, _):
            return jnp.tanh(c @ c), ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    f = jax.jit(loop)
    float(f(a).sum())  # compile + warm
    t0 = time.time(); float(f(a).sum()); t_comp = time.time() - t0
    log(f"compute loop: {t_comp:.2f}s")

    mb = 17 * 2048 * 2048 * 3 // 2 / 1e6  # emit frames/window at upscale 4
    buf = jax.device_put(
        np.random.randint(0, 255, (17, 2048 * 2048 * 3 // 2), np.uint8))
    buf.block_until_ready()
    # jax caches the host copy after the first np.asarray of an array, so a
    # REAL repeat transfer needs a fresh device buffer each time
    fresh = jax.jit(lambda x, s: x ^ s)
    np.asarray(fresh(buf, jnp.uint8(7)))  # first fetch pays session setup
    t_d2h = None
    for i in range(2):
        b = fresh(buf, jnp.uint8(i)); b.block_until_ready()
        t0 = time.time(); np.asarray(b); t_d2h = time.time() - t0
        log(f"d2h {mb:.0f}MB: {t_d2h:.2f}s -> {mb / t_d2h:.1f} MB/s")

    # product order: compute dispatched first, then the async fetch of an
    # already-ready buffer (the deferred emit's exact shape)
    b = fresh(buf, jnp.uint8(101)); b.block_until_ready()
    t0 = time.time()
    r = f(a)
    b.copy_to_host_async()
    np.asarray(b)
    float(r.sum())
    t_overlap = time.time() - t0
    log(f"compute-dispatch then async d2h: {t_overlap:.2f}s "
        f"(serial {t_comp + t_d2h:.2f}s, full overlap {max(t_comp, t_d2h):.2f}s)")

    b = fresh(buf, jnp.uint8(102)); b.block_until_ready()
    t0 = time.time()
    b.copy_to_host_async()
    r = f(a)
    np.asarray(b)
    float(r.sum())
    log(f"async d2h then compute-dispatch: {time.time() - t0:.2f}s")

    x_in = np.random.randint(0, 255, (24, 512, 512, 3)).astype(np.uint8)
    s = jax.jit(lambda x: x.astype(jnp.float32).sum())
    float(s(jax.device_put(x_in)))
    for _ in range(2):
        t0 = time.time(); xd = jax.device_put(x_in); float(s(xd))
        dt = time.time() - t0
        log(f"h2d 18.9MB u8 (+sum readback): {dt * 1000:.0f} ms")


def bench_programs(F: int = 16):
    """Per-stage breakdown of the production window at bench geometry:
    prepare / denoise / decode programs + stitch ops (color match, yuv)."""
    import numpy as np

    import bench
    from controlanimate_tpu.ops.color_match import match_colors_u8
    from controlanimate_tpu.ops.yuv import rgb_to_yuv420
    from controlanimate_tpu.pipelines.engine import WindowStatic

    cfg = bench.RunConfig(
        width=512, height=512, frame_count=F, overlap_length=8,
        use_lcm=True, steps=4, guidance_scale=7.5, strength=0.9,
        lcm_origin_steps=50, prompt="a cat", n_prompt="", seed=7,
        dtype="bfloat16",
    )
    pipeline = bench.build_pipeline(cfg)
    eng = pipeline.engine
    st = WindowStatic(
        steps=4, use_lcm=True, guidance_scale=7.5, strength=0.9,
        lcm_origin_steps=50, frame_count=F, height=512, width=512,
        output_uint8=True,
    )
    sched = eng.build_scheduler(st)
    prepare = eng._make_prepare_fn(st, sched)
    denoise = eng._make_denoise_fn(st, sched)
    decode = eng._make_decode_fn(True)

    key = jax.random.PRNGKey(0)
    rng = __import__("numpy").random.RandomState(0)
    frames = jnp.asarray((rng.rand(1, F, 512, 512, 3) * 255).astype("uint8"))
    text = jax.random.normal(key, (1, 77, 768), jnp.bfloat16)
    latent_shape = (1, F, 64, 64, 4)

    lat = timeit_ret(f"prepare (incl vae encode {F}f)", lambda: prepare(
        eng.m.vae_params, frames, None, latent_shape, key))
    lat2 = timeit_ret("denoise (4 LCM steps)", lambda: denoise(
        eng.m.unet_params, (), text, (), lat, key))
    out = timeit_ret(f"decode ({F}f -> u8)", lambda: decode(eng.m.vae_params, lat2))
    ref = out[0, 0]
    timeit_ret(f"color_match_u8 {F}f", lambda: match_colors_u8(out[0], ref))
    timeit_ret(f"rgb_to_yuv420 {F}f", lambda: rgb_to_yuv420(out[0]))


def timeit_ret(name, fn, iters=3):
    t0 = time.time()
    out = fn()
    float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    log(f"{name} compile+first: {time.time()-t0:.1f}s")
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn()
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        times.append(time.time() - t0)
    log(f"{name} best: {min(times)*1000:.2f} ms")
    return out


def bench_motion():
    """Temporal-attention layout shootout at the UNet's level geometries:
    which formulation of frame-axis attention (huge batch, seq 16) is
    fastest on this chip?"""
    key = jax.random.PRNGKey(0)
    for (B, F, N, C) in [(2, 16, 4096, 320), (2, 16, 1024, 640), (2, 16, 256, 1280)]:
        H = 8
        D = C // H
        ks = jax.random.split(key, 6)
        x = jax.random.normal(ks[0], (B, F, N, C), jnp.bfloat16)
        wq = jax.random.normal(ks[1], (C, C), jnp.bfloat16) * 0.02
        wk = jax.random.normal(ks[2], (C, C), jnp.bfloat16) * 0.02
        wv = jax.random.normal(ks[3], (C, C), jnp.bfloat16) * 0.02
        wo = jax.random.normal(ks[4], (C, C), jnp.bfloat16) * 0.02
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)
        log(f"--- motion geometry B{B} F{F} N{N} C{C}")

        def v_einsum(x):
            q = (x @ wq).reshape(B, F, N, H, D)
            k = (x @ wk).reshape(B, F, N, H, D)
            v = (x @ wv).reshape(B, F, N, H, D)
            logits = jnp.einsum("bfnhd,bgnhd->bnhfg", q, k) * (D**-0.5)
            p = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
            out = jnp.einsum("bnhfg,bgnhd->bfnhd", p, v).reshape(B, F, N, C)
            return out @ wo

        def v_qkv_fused(x):
            qkv = (x @ wqkv).reshape(B, F, N, 3, H, D)
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
            logits = jnp.einsum("bfnhd,bgnhd->bnhfg", q, k) * (D**-0.5)
            p = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
            out = jnp.einsum("bnhfg,bgnhd->bfnhd", p, v).reshape(B, F, N, C)
            return out @ wo

        def v_transpose_sdpa(x):
            xt = x.transpose(0, 2, 1, 3).reshape(B * N, F, C)
            q = (xt @ wq).reshape(B * N, F, H, D)
            k = (xt @ wk).reshape(B * N, F, H, D)
            v = (xt @ wv).reshape(B * N, F, H, D)
            out = jax.nn.dot_product_attention(q, k, v).reshape(B * N, F, C)
            out = (out @ wo).reshape(B, N, F, C).transpose(0, 2, 1, 3)
            return out

        def v_merged_heads(x):
            # single-head-equivalent blocked form: contract d per head but
            # batch (n) into the matmul minor dims via one big einsum
            q = (x @ wq).reshape(B, F, N * H, D)
            k = (x @ wk).reshape(B, F, N * H, D)
            v = (x @ wv).reshape(B, F, N * H, D)
            logits = jnp.einsum("bfmd,bgmd->bmfg", q, k) * (D**-0.5)
            p = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
            out = jnp.einsum("bmfg,bgmd->bfmd", p, v).reshape(B, F, N, C)
            return out @ wo

        for name, fn in [("einsum(cur)", v_einsum), ("qkv_fused", v_qkv_fused),
                         ("transpose_sdpa", v_transpose_sdpa),
                         ("merged_heads", v_merged_heads)]:
            timeit(f"  {name}", jax.jit(fn), x)


def bench_motion_incontext():
    """In-context motion-module ablations: monkeypatch pieces of the motion
    stack and measure the FULL UNet forward (single-dispatch micro-timings
    can't resolve sub-30ms ops through the tunnel)."""
    from flax import linen as nn

    from controlanimate_tpu.models import motion_module as mm
    from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    key = jax.random.PRNGKey(0)
    B, F, h, w = 1, 16, 64, 64  # LCM batch (no CFG duplication)
    sample = jax.random.normal(key, (B, F, h, w, 4), jnp.bfloat16)
    t = jnp.asarray([500])
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)

    def measure(tag):
        model = UNet3DConditionModel(UNet3DConfig(), dtype=jnp.bfloat16)
        params = jax.jit(
            lambda k: model.init(
                k, jnp.zeros((1, 2, 8, 8, 4), jnp.bfloat16), jnp.asarray([1]), ctx[:1]
            )["params"]
        )(key)
        f = jax.jit(lambda p, s, tt, c: model.apply({"params": p}, s, tt, c))
        timeit(f"unet[{tag}]", f, params, sample, t, ctx)

    from controlanimate_tpu.ops import motion_kernel as mk

    orig_attn = mm.TemporalEinsumAttention.__call__
    orig_block = mm.TemporalAttentionBlock.__call__
    orig_tblock = mm.TemporalTransformerBlock.__call__

    measure("motion-full-fused")   # fused Pallas motion kernel (default)
    mk.set_motion_kernel_enabled(False)
    measure("motion-full-xla")

    # (a) attention math removed, projections kept (isolates einsum+softmax)
    def attn_projs_only(self, hcat):
        B_, F_, N_, C_ = hcat.shape
        q = nn.Dense(C_, use_bias=False, name="to_q", dtype=self.dtype)(hcat)
        k = nn.Dense(C_, use_bias=False, name="to_k", dtype=self.dtype)(hcat)
        v = nn.Dense(C_, use_bias=False, name="to_v", dtype=self.dtype)(hcat)
        return nn.Dense(C_, name="to_out_0", dtype=self.dtype)(q + k + v)

    mm.TemporalEinsumAttention.__call__ = attn_projs_only
    measure("motion-no-attn-math")
    mm.TemporalEinsumAttention.__call__ = orig_attn

    # (b) whole attention blocks identity (isolates LN+PE+attn)
    def block_identity(self, x):
        return x

    mm.TemporalAttentionBlock.__call__ = block_identity
    measure("motion-no-attn-blocks")
    mm.TemporalAttentionBlock.__call__ = orig_block

    # (c) transformer block = attention only, no FFN/norm
    def tblock_no_ffn(self, x):
        for i, _ in enumerate(self.attention_block_types):
            x = mm.TemporalAttentionBlock(
                self.heads, self.max_len, self.use_pos_encoding,
                name=f"attention_blocks_{i}", dtype=self.dtype,
            )(x)
        return x

    mm.TemporalTransformerBlock.__call__ = tblock_no_ffn
    measure("motion-no-ffn")
    mm.TemporalTransformerBlock.__call__ = orig_tblock
    mk.set_motion_kernel_enabled(True)


def bench_vae_chunked():
    """Does chunking the 16-frame VAE decode relieve memory pressure?"""
    from controlanimate_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))["params"]
    )(key)
    z = jax.random.normal(key, (16, 64, 64, 4), jnp.bfloat16)

    def dec_all(p, z):
        return vae.apply({"params": p}, z, method=AutoencoderKL.decode)

    timeit("decode 16f monolithic", jax.jit(dec_all), params, z)

    for chunk in (8, 4):
        def dec_chunked(p, z, chunk=chunk):
            zc = z.reshape(16 // chunk, chunk, 64, 64, 4)
            out = jax.lax.map(lambda zz: vae.apply({"params": p}, zz, method=AutoencoderKL.decode), zc)
            return out.reshape(16, 512, 512, 3)

        timeit(f"decode 16f in {16//chunk}x{chunk} chunks", jax.jit(dec_chunked), params, z)


def bench_colorops():
    """Color-match sub-op breakdown (repeat-looped inside one jit to beat
    the ~25ms dispatch floor)."""
    import numpy as np

    from controlanimate_tpu.ops import color_match as cm

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (16, 512, 512, 3)).astype("uint8"))
    ref = jnp.asarray(rng.randint(0, 256, (512, 512, 3)).astype("uint8"))

    timeit("match_colors_u8 (full)", jax.jit(cm.match_colors_u8), frames, ref)

    hist_only = jax.jit(lambda f, r: cm._hist_match_u8(f, r, cm._ref_cdfs(r)))
    timeit("hist_match_u8 stage", hist_only, frames, ref)

    mkl_only = jax.jit(
        lambda f, r: jax.vmap(lambda x: cm._mkl_transfer_ns(x, r.astype(jnp.float32)))(
            f.astype(jnp.float32)
        )
    )
    timeit("mkl_ns stage", mkl_only, frames, ref)

    # LUT gather alone: apply an identity LUT per channel
    def lut_apply(f):
        lut = jnp.arange(256, dtype=jnp.uint8)
        return lut[f.astype(jnp.int32)]

    timeit("lut gather 16f", jax.jit(lut_apply), frames)

    # CDF estimation alone (stride 4, one frame-channel x 48)
    def cdfs(f):
        flat = f.reshape(16, -1, 3).astype(jnp.int32)
        return jax.vmap(lambda img: jax.vmap(
            lambda s: cm._cdf256(s, 4), in_axes=1)(img))(flat)

    timeit("cdf256 x48 (stride4)", jax.jit(cdfs), frames)


def bench_window_staged():
    """Facade window with the input frames PRE-STAGED on device — isolates
    compute + output readback from the input transfer."""
    import numpy as np

    import bench

    cfg_mod = bench.RunConfig(
        width=512, height=512, frame_count=16, overlap_length=8,
        use_lcm=True, steps=4, guidance_scale=7.5, strength=0.9,
        lcm_origin_steps=50, prompt="a cat, masterpiece", n_prompt="blurry",
        seed=7, dtype="bfloat16",
    )
    pipeline = bench.build_pipeline(cfg_mod)
    rng = np.random.RandomState(0)
    staged = jnp.asarray((rng.rand(16, 512, 512, 3) * 255).astype(np.uint8))
    staged.block_until_ready()
    out = pipeline.animate(staged, None, overlaps=0, seed=7)
    log(f"staged first window done {out.shape}")
    times = []
    for i in range(4):
        t0 = time.time()
        out = pipeline.animate(staged, None, overlaps=0, seed=7)
        times.append(time.time() - t0)
        log(f"staged window {i}: {times[-1]*1000:.1f} ms")
    log(f"staged fps: {16/min(times):.2f}")


def bench_bigwin():
    """Emitted-fps study for larger windows (VERDICT r2 #3): with overlap 8,
    a 16-frame window emits 8 novel frames, a 24-frame window 16, a 32-frame
    window 24 — the motion PE table (v2 max_len 32) allows all three. Runs
    the FULL orchestrator loop in-memory at each frame_count and reports the
    warm emitted rate."""
    import tempfile
    import numpy as np

    import bench
    from controlanimate_tpu.io.media import ArrayFrameSink, ArrayFrameSource
    from scripts.vid2vid import vid2vid

    import sys as _sys

    if "bigwin32" in _sys.argv:
        counts = (32,)
    elif "bigwin24" in _sys.argv:
        counts = (24,)
    else:
        counts = (16, 24)
    pipeline = None
    for F in counts:
        with tempfile.TemporaryDirectory() as td:
            cfg = bench.RunConfig(
                width=512, height=512, frame_count=F, overlap_length=8,
                use_lcm=True, steps=4, guidance_scale=7.5, strength=0.9,
                overlap_strength=0.9, lcm_origin_steps=50, prompt="a cat",
                n_prompt="", seed=7, dtype="bfloat16", output_video_dir=td,
                upscale=1.0, checkpoint_interval=0,
            )
            if pipeline is None:
                pipeline = bench.build_pipeline(cfg)
            else:
                from controlanimate_tpu.pipelines.facade import ControlAnimatePipeline

                pipeline = ControlAnimatePipeline(
                    cfg, models=pipeline.models, text_stack=pipeline.text
                )
            novel = F - 8
            n_windows = 8
            total = F + (n_windows - 1) * novel
            rng = np.random.RandomState(0)
            frames_in = (rng.rand(total, 512, 512, 3) * 255).astype(np.uint8)
            t0 = time.time()
            summary = vid2vid(
                config=cfg, pipeline=pipeline,
                frame_source=ArrayFrameSource(frames_in), frame_sink=yuv_sink(),
            )
            log(f"F={F} cold: {summary['frames_written']} frames/"
                f"{summary['windows']} win in {time.time()-t0:.1f}s")
            sink = yuv_sink()
            t0 = time.time()
            summary = vid2vid(
                config=cfg, pipeline=pipeline,
                frame_source=ArrayFrameSource(frames_in), frame_sink=sink,
            )
            wall = time.time() - t0
            log(f"F={F} warm: {summary['frames_written']} frames in {wall:.1f}s"
                f" -> {summary['frames_written']/wall:.2f} emitted fps"
                f" ({novel} novel/window steady state); timers: {summary['timers']}")


def bench_f24opt():
    """F=24/32 window optimization study:
    (a) motion-attention formulation shootout at F=24 per UNet level;
    (b) denoise F=24 with Pallas flash spatial attention vs XLA fused
        (XLA materializes the (BF, H, N, N) logits — 6.4GB at F=24);
    (c) F=32 feasibility with flash attention (F=32 OOMed with XLA)."""
    import numpy as np

    import bench
    from controlanimate_tpu.ops import attention as attn_mod
    from controlanimate_tpu.pipelines.engine import WindowStatic

    REPS = 8
    import sys as _sys
    micro_shapes = (
        [(4096, 320, 8), (1024, 640, 8), (256, 1280, 8)]
        if "f24micro" in _sys.argv else []
    )
    # (a) motion formulations at F=24, levels 0-2 geometry (B=1 LCM)
    for (N, C, H) in micro_shapes:
        F = 24
        D = C // H
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jax.random.normal(ks[0], (1, F, N, H, D), jnp.bfloat16)
        log(f"--- motion F={F} N={N} C={C}")

        def loop(fn):
            def run(x):
                def body(c, _):
                    return fn(c).astype(c.dtype), None
                out, _ = jax.lax.scan(body, x, None, length=REPS)
                return out
            return jax.jit(run)

        def einsum_form(q):
            logits = jnp.einsum("bfnhd,bgnhd->bnhfg", q, q) * (D**-0.5)
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            return jnp.einsum("bnhfg,bgnhd->bfnhd", p, q)

        def mulreduce_form(q):
            logits = (
                q[:, :, None].astype(jnp.float32) * q[:, None].astype(jnp.float32)
            ).sum(-1) * (D**-0.5)  # (B, F, G, N, H)
            p = jax.nn.softmax(logits, axis=2)
            return (p[..., None] * q[:, None].astype(jnp.float32)).sum(2).astype(q.dtype)

        t = timeit("  einsum x8", loop(einsum_form), x)
        log(f"    => {t/REPS*1000:.2f} ms/call")
        t = timeit("  mulreduce x8", loop(mulreduce_form), x)
        log(f"    => {t/REPS*1000:.2f} ms/call")

    # (b)/(c) denoise with flash vs XLA attention at F=24, then F=32 flash
    for F, use_pallas in [(24, True), (32, True), (32, False)]:
        cfg = bench.RunConfig(
            width=512, height=512, frame_count=F, overlap_length=8,
            use_lcm=True, steps=4, guidance_scale=7.5, strength=0.9,
            lcm_origin_steps=50, prompt="a cat", n_prompt="", seed=7,
            dtype="bfloat16",
        )
        attn_mod.set_pallas_enabled(use_pallas)
        try:
            pipeline = bench.build_pipeline(cfg)
            eng = pipeline.engine
            st = WindowStatic(
                steps=4, use_lcm=True, guidance_scale=7.5, strength=0.9,
                lcm_origin_steps=50, frame_count=F, height=512, width=512,
                output_uint8=True,
            )
            sched = eng.build_scheduler(st)
            denoise = eng._make_denoise_fn(st, sched)
            decode = eng._make_decode_fn(True)
            key = jax.random.PRNGKey(0)
            text = jax.random.normal(key, (1, 77, 768), jnp.bfloat16)
            lat = jax.random.normal(key, (1, F, 64, 64, 4), jnp.float32)
            timeit(f"denoise F={F} pallas={use_pallas}", denoise,
                   eng.m.unet_params, (), text, (), lat, key, iters=3)
            lat2 = denoise(eng.m.unet_params, (), text, (), lat, key)
            timeit(f"decode F={F} pallas={use_pallas}", decode,
                   eng.m.vae_params, lat2, iters=3)
        except Exception as e:
            log(f"F={F} pallas={use_pallas} FAILED: {type(e).__name__}: {str(e)[:200]}")
        finally:
            attn_mod.set_pallas_enabled(False)


def bench_f24v2():
    """Second round of F=24/32 window optimization:
    motion-kernel + einsum-form denoise variants at F=24, then the full
    F=32 program set with chunked decode + auto flash attention."""
    import os

    import numpy as np

    import bench
    from controlanimate_tpu.ops.motion_kernel import set_motion_kernel_enabled
    from controlanimate_tpu.pipelines.engine import WindowStatic

    def build(F, label, motion_kernel=False, motion_form="auto", chunk=0):
        os.environ["CONTROLANIMATE_MOTION_FORM"] = motion_form
        set_motion_kernel_enabled(motion_kernel)
        cfg = bench.RunConfig(
            width=512, height=512, frame_count=F, overlap_length=8,
            use_lcm=True, steps=4, guidance_scale=7.5, strength=0.9,
            lcm_origin_steps=50, prompt="a cat", n_prompt="", seed=7,
            dtype="bfloat16",
        )
        pipeline = bench.build_pipeline(cfg)
        eng = pipeline.engine
        st = WindowStatic(
            steps=4, use_lcm=True, guidance_scale=7.5, strength=0.9,
            lcm_origin_steps=50, frame_count=F, height=512, width=512,
            output_uint8=True, decode_chunk=chunk,
        )
        sched = eng.build_scheduler(st)
        key = jax.random.PRNGKey(0)
        text = jax.random.normal(key, (1, 77, 768), jnp.bfloat16)
        lat = jax.random.normal(key, (1, F, 64, 64, 4), jnp.float32)
        try:
            denoise = eng._make_denoise_fn(st, sched)
            timeit(f"denoise F={F} [{label}]", denoise,
                   eng.m.unet_params, (), text, (), lat, key, iters=3)
            if chunk or F >= 32:
                prepare = eng._make_prepare_fn(st, sched)
                frames = jnp.asarray(
                    (np.random.RandomState(0).rand(1, F, 512, 512, 3) * 255).astype("uint8"))
                timeit(f"prepare F={F} [{label}]", prepare,
                       eng.m.vae_params, frames, None, (1, F, 64, 64, 4), key, iters=3)
                decode = eng._make_decode_fn(True, chunk)
                lat2 = denoise(eng.m.unet_params, (), text, (), lat, key)
                timeit(f"decode F={F} chunk={chunk} [{label}]", decode,
                       eng.m.vae_params, lat2, iters=3)
        except Exception as e:
            log(f"F={F} [{label}] FAILED: {type(e).__name__}: {str(e)[:200]}")
        finally:
            set_motion_kernel_enabled(False)
            os.environ["CONTROLANIMATE_MOTION_FORM"] = "auto"

    build(24, "baseline")
    build(24, "einsum", motion_form="einsum")
    build(24, "motion-kernel", motion_kernel=True)
    build(32, "flash+chunk16", chunk=16)


def bench_banded():
    """Banded temporal attention vs dense at long windows (VERDICT r3 #3:
    attack the motion module's F² wall so F=32 windows win). Full
    orchestrator emitted fps, in-memory IO, 8 windows per pass:
      - F=24 band=0   (dense shipped profile — the number to beat)
      - F=32 band=0   (dense: r3 measured 7.85, the F² wall)
      - F=32 band=8   (each frame sees ±8 neighbours ≥ the overlap length)
      - F=32 band=12
    Banded is an opt-in approximation (RunConfig.temporal_band); exactness
    at band >= F-1 is golden-tested on CPU (tests/test_banded_motion.py)."""
    import tempfile

    import numpy as np

    import bench
    from controlanimate_tpu.io.media import ArrayFrameSink, ArrayFrameSource
    from controlanimate_tpu.pipelines.facade import ControlAnimatePipeline
    from scripts.vid2vid import vid2vid

    models = text = None
    for F, band in ((24, 0), (32, 0), (32, 8), (32, 12)):
        novel = F - 8
        n_windows = 8
        total = F + (n_windows - 1) * novel
        rng = np.random.RandomState(0)
        frames_in = (rng.rand(total, 512, 512, 3) * 255).astype(np.uint8)
        with tempfile.TemporaryDirectory() as td:
            cfg = bench.RunConfig(
                width=512, height=512, frame_count=F, overlap_length=8,
                use_lcm=True, steps=4, guidance_scale=7.5, strength=0.9,
                overlap_strength=0.9, lcm_origin_steps=50, prompt="a cat",
                n_prompt="", seed=7, dtype="bfloat16", output_video_dir=td,
                checkpoint_interval=0, temporal_band=band,
            )
            if models is None:
                pipeline = bench.build_pipeline(cfg)
                models, text = pipeline.models, pipeline.text
            else:
                # the band is a trace-time constant baked into the UNet
                # MODULE (not its params — the param tree is band-invariant),
                # so rebuild the module with the banded motion config and
                # reuse the same device params across every variant
                import dataclasses as _dc

                from controlanimate_tpu.models.unet3d import UNet3DConditionModel

                u = models.unet
                ucfg = _dc.replace(
                    u.config, motion=_dc.replace(u.config.motion, attention_band=band)
                )
                m2 = _dc.replace(
                    models, unet=UNet3DConditionModel(ucfg, dtype=u.dtype)
                )
                pipeline = ControlAnimatePipeline(cfg, models=m2, text_stack=text)
            for tag in ("cold", "warm"):
                sink = yuv_sink()
                t0 = time.time()
                s = vid2vid(config=cfg, pipeline=pipeline,
                            frame_source=ArrayFrameSource(frames_in),
                            frame_sink=sink)
                wall = time.time() - t0
                log(f"banded F={F} band={band} {tag}: {s['frames_written']} frames / "
                    f"{s['windows']} windows in {wall:.1f}s -> "
                    f"{s['frames_written'] / wall:.2f} emitted fps")
                assert s["frames_written"] == total, s


def bench_hbmchunk():
    """Big-window level-0 spatial attention: Pallas flash (the pre-r4
    bounded-memory fallback) vs CHUNKED XLA fused attention (lax.map over
    batch chunks under the logits budget) at the F=32 shape (32,4096,8,40)
    whose full XLA logits (8.6GB) OOM a v5e. Loop-in-jit x8 so dispatch
    floors cancel."""
    from controlanimate_tpu.ops import attention as attn_mod
    from controlanimate_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    for shape in ((32, 4096, 8, 40), (48, 4096, 8, 40)):
        ks = jax.random.split(key, 3)
        q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)

        def loop(fn, q, k, v, n=8):
            def body(c, _):
                o = fn(c, k, v)
                return o, ()
            out, _ = jax.lax.scan(body, q, None, length=n)
            return out

        f_flash = jax.jit(lambda q, k, v: loop(flash_attention, q, k, v))
        f_chunk = jax.jit(lambda q, k, v: loop(attn_mod._chunked_xla_attention, q, k, v))
        timeit(f"hbm l0 {shape} [flash]", f_flash, q, k, v)
        timeit(f"hbm l0 {shape} [chunked-xla]", f_chunk, q, k, v)


def bench_int8():
    """v5e int8-MXU rate probe: does int8 x int8 -> int32 actually run at
    ~2x the bf16 MXU rate through jax/XLA on this stack? Gate for any
    opt-in quantized-denoise work — if the lowering doesn't approach the
    int8 rate (v5e peak 394 TOPS int8 vs 197 TFLOP/s bf16), weight/act
    quantization buys nothing and should not be built. Loop-in-jit with a
    requantize (>>7 -> int8) between steps so each iteration depends on the
    last and the requantize cost (real in any quantized model) is included;
    bf16 arm normalizes + casts back for symmetry."""
    key = jax.random.PRNGKey(0)

    # --- square matmul, MXU-saturating geometry
    M = K = N = 8192
    xf = jax.random.normal(key, (M, K), jnp.bfloat16)
    wf = jax.random.normal(jax.random.split(key)[0], (K, N), jnp.bfloat16)
    xi = (xf * 10).astype(jnp.int8)
    wi = (wf * 10).astype(jnp.int8)
    iters = 8
    flops = 2.0 * M * K * N * iters

    def loop_bf16(x, w):
        def body(c, _):
            y = jnp.dot(c, w)  # f32 accumulation (XLA TPU default)
            return (y * (1.0 / K)).astype(jnp.bfloat16), ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    def loop_int8(x, w):
        def body(c, _):
            y = jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jax.lax.shift_right_arithmetic(y, 7).astype(jnp.int8), ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    b = timeit(f"int8 mm {M}x{K}x{N} [bf16]", jax.jit(loop_bf16), xf, wf)
    i = timeit(f"int8 mm {M}x{K}x{N} [int8]", jax.jit(loop_int8), xi, wi)
    log(f"  matmul: bf16 {flops / b / 1e12:.1f} TFLOP/s, int8 "
        f"{flops / i / 1e12:.1f} TOP/s, speedup {b / i:.2f}x")

    # --- UNet-geometry conv3x3 (level-0 denoise workhorse)
    B, H, W, C = 16, 64, 64, 320
    xf = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    kf = jax.random.normal(jax.random.split(key)[1], (3, 3, C, C), jnp.bfloat16) * 0.05
    xi = (xf * 10).astype(jnp.int8)
    ki = (kf * 200).astype(jnp.int8)
    cflops = 2.0 * B * H * W * C * C * 9 * iters
    dn = jax.lax.conv_dimension_numbers(xf.shape, kf.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_bf16(x, k):
        def body(c, _):
            y = jax.lax.conv_general_dilated(c, k, (1, 1), "SAME", dimension_numbers=dn)
            return (y * (1.0 / C)).astype(jnp.bfloat16), ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    def conv_int8(x, k):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, k, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            return jax.lax.shift_right_arithmetic(y, 7).astype(jnp.int8), ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    b = timeit(f"int8 conv3x3 {(B, H, W, C)} [bf16]", jax.jit(conv_bf16), xf, kf)
    i = timeit(f"int8 conv3x3 {(B, H, W, C)} [int8]", jax.jit(conv_int8), xi, ki)
    log(f"  conv3x3: bf16 {cflops / b / 1e12:.1f} TFLOP/s, int8 "
        f"{cflops / i / 1e12:.1f} TOP/s, speedup {b / i:.2f}x")


def _synth_rrdb_ckpt() -> str:
    """Synthetic anime_6B-geometry RRDBNet checkpoint (conv cost is
    weight-independent) written to /tmp; returns the path."""
    import numpy as np
    import torch

    rng = np.random.RandomState(0)

    def w(o, i):
        return torch.from_numpy(((rng.rand(o, i, 3, 3) - 0.5) * 0.05).astype(np.float32))

    def b(o):
        return torch.from_numpy(np.zeros(o, np.float32))

    sd = {"conv_first.weight": w(64, 3), "conv_first.bias": b(64)}
    ins, outs = (64, 96, 128, 160, 192), (32, 32, 32, 32, 64)
    for blk in range(6):
        for r in (1, 2, 3):
            for c in range(1, 6):
                sd[f"body.{blk}.rdb{r}.conv{c}.weight"] = w(outs[c - 1], ins[c - 1])
                sd[f"body.{blk}.rdb{r}.conv{c}.bias"] = b(outs[c - 1])
    for t in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
        sd[f"{t}.weight"] = w(64, 64)
        sd[f"{t}.bias"] = b(64)
    sd["conv_last.weight"] = w(3, 64)
    sd["conv_last.bias"] = b(3)
    ckpt = "/tmp/rrdb_synth_6b.pth"
    torch.save({"params_ema": sd}, ckpt)
    return ckpt


def bench_upchunk():
    """Raw RRDB dispatch rate at 512->2048, (dtype x frames-per-dispatch).

    The upscale4 orchestrator run showed f32 (chunk 1) BEATING bf16
    (chunk 2) — 62 vs 80 s for 136 frames — which is backwards for an
    MXU-bound conv net. Disentangle dtype from chunk size: time the
    device-u8 program per frame for chunk in {1,2,4} x {bf16,f32}."""
    import numpy as np

    from controlanimate_tpu.models.upscaler import Upscaler

    ckpt = _synth_rrdb_ckpt()
    # analytic roofline at 512->2048, anime_6B geometry (per frame):
    # RDB convs (9-tap, per 512^2 px): c1 64->32, c2 96->32, c3 128->32,
    # c4 160->32, c5 192->64 = 239,616 MAC/px; x3 RDB x6 RRDB = 4.31 M/px.
    # conv_first/body ~0.04 M/px; up1 @1024^2 + up2 @2048^2 (folded, 4/9
    # MACs) + conv_hr/last @2048^2 = ~0.24 TMAC. Total ~1.4 TMAC = 2.8 TFLOP.
    px = 512 * 512
    macs = (4.31e6 + 9 * (3 * 64 + 64 * 64)) * px \
        + (4 / 9) * 9 * 64 * 64 * (4 * px + 16 * px) \
        + 9 * (64 * 64 + 64 * 3) * 16 * px
    log(f"roofline/frame: {2 * macs / 1e12:.2f} TFLOP "
        f"-> {2 * macs / 197e12 * 1e3:.1f} ms at v5e bf16 peak; "
        f"~12-15 GB moved unfused -> ~15-18 ms at 819 GB/s")
    x = jnp.asarray((np.random.RandomState(1).rand(4, 512, 512, 3) * 255).astype(np.uint8))
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        ups = Upscaler(4.0, model_path=ckpt, num_block=6, dtype=dt)
        ups._jit_u8 = jax.jit(
            lambda p, xx, m=ups.model: jnp.clip(
                m.apply({"params": p}, xx.astype(jnp.float32) / 255.0)
                * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8))
        log(f"--- upchunk dtype={dt_name} (auto chunk at 512px: "
            f"{ups._hbm_chunk(16, 512, 512)})")
        for c in (1, 2, 4):
            try:
                best = timeit(f"  chunk={c}", ups._jit_u8, ups.params, x[:c])
                log(f"  chunk={c}: {best * 1000 / c:.1f} ms/frame")
            except Exception as e:  # RESOURCE_EXHAUSTED at big chunks
                log(f"  chunk={c}: FAILED {type(e).__name__}: {str(e)[:200]}")


def bench_uptrace():
    """Profiler trace of the device-u8 RRDB program at (1,512,512,3):
    where do 147ms/frame go when the analytic roofline is 14-18ms
    (perf/upchunk_r4.json)? Aggregates device-track events by op name —
    device timestamps are immune to host contention. Informs whether the
    fix is a fused Pallas RDB kernel (HBM/fusion breaks), a layout change
    (N=32 lane padding), or nothing (XLA conv lowering floor)."""
    import glob
    import gzip
    import json as _json

    import numpy as np

    from controlanimate_tpu.models.upscaler import Upscaler

    import os

    ckpt = _synth_rrdb_ckpt()
    x = jnp.asarray(
        (np.random.RandomState(1).rand(1, 512, 512, 3) * 255).astype(np.uint8))
    ups = None
    for form in ("concat", "sum", "s2d"):
        os.environ["CONTROLANIMATE_RRDB_FORM"] = form
        u = Upscaler(4.0, model_path=ckpt, num_block=6, dtype=jnp.bfloat16)
        timeit(f"rrdb[{form}] u8 (1,512,512,3)", u.upscale_batch_device, x, iters=3)
        ups = u  # trace the last (s2d) form below
    os.environ.pop("CONTROLANIMATE_RRDB_FORM", None)

    tdir = "/tmp/uptrace"
    jax.profiler.start_trace(tdir)
    for _ in range(3):
        out = ups.upscale_batch_device(x)
        float(out.astype(jnp.float32).sum())
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        log("no trace captured")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = _json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pick pids whose process name mentions TPU/device
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = str(e.get("args", {}).get("name", ""))
            if "TPU" in nm or "/device:" in nm or "XLA" in nm.upper():
                dev_pids.add(e.get("pid"))
    agg: dict = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        a = agg.setdefault(name, [0.0, 0])
        a[0] += e.get("dur", 0) / 1e3  # us -> ms
        a[1] += 1
    total = sum(v[0] for v in agg.values())
    log(f"device pids {sorted(dev_pids)}; {len(agg)} distinct ops, "
        f"{total:.1f} ms total device time over 3 calls")
    for name, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]:
        args_hint = ""
        log(f"  {ms:8.2f} ms x{n:3d}  {name[:110]}{args_hint}")


def bench_upconv():
    """RealESRGAN up-stage conv family (VERDICT r4 next #1): XLA forms vs
    the Pallas im2col kernels (ops/upconv_kernel.py) at the exact shipped
    geometries, loop-in-jit x8 (dispatch floors cancel), bf16. Then the
    FULL device-u8 RRDB per-frame A/B via CONTROLANIMATE_UP_KERNEL."""
    import os

    import numpy as np

    from controlanimate_tpu.models.upscaler import Upscaler
    from controlanimate_tpu.ops.upconv_kernel import (
        conv3x3_small, d2s, upsample2x_conv3x3_s2d)
    from controlanimate_tpu.ops.upsample import upsample2x_conv3x3

    REPS = 8
    key = jax.random.PRNGKey(0)

    def loop(fn, x, n=REPS):
        # chain through a 1px roll so XLA cannot elide iterations; shapes
        # must be preserved by fn for chaining -> wrap with a resize-back
        def body(c, _):
            y = fn(c)
            return jnp.roll(y, 1, axis=1), ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    C = 64
    for H in (512, 1024):
        ks = jax.random.split(jax.random.fold_in(key, H), 3)
        x = jax.random.normal(ks[0], (1, H, H, C), jnp.bfloat16)
        k = jax.random.normal(ks[1], (3, 3, C, C), jnp.bfloat16) * 0.05
        b = jnp.zeros((C,), jnp.float32)
        log(f"--- upconv upsample2x geometry (1,{H},{H},{C}) x{REPS}")
        # shape-preserving wrappers: upsample then 2x2-avg back down
        def shrink(y):
            B, H2, W2, c = y.shape
            return y.reshape(B, H2 // 2, 2, W2 // 2, 2, c).mean((2, 4)).astype(y.dtype)
        f_xla = jax.jit(lambda x: loop(
            lambda c: shrink(jax.nn.leaky_relu(
                upsample2x_conv3x3(c, k, b, dtype=jnp.bfloat16), 0.2)), x))
        t_x = timeit(f"  xla transposed-upsample {H}", f_xla, x)
        f_pl = jax.jit(lambda x: loop(
            lambda c: shrink(d2s(upsample2x_conv3x3_s2d(c, k, b, act="lrelu"))), x))
        t_p = timeit(f"  pallas s2d-upsample     {H}", f_pl, x)
        log(f"  => upsample {H}: xla {t_x*1000/REPS:.2f} vs pallas "
            f"{t_p*1000/REPS:.2f} ms/call ({t_x/t_p:.2f}x)")

    for H in (1024, 2048):
        ks = jax.random.split(jax.random.fold_in(key, 10 * H), 3)
        x = jax.random.normal(ks[0], (1, H, H, C), jnp.bfloat16)
        k = jax.random.normal(ks[1], (3, 3, C, C), jnp.bfloat16) * 0.05
        b = jnp.zeros((C,), jnp.float32)
        log(f"--- upconv plain conv3x3 geometry (1,{H},{H},{C}) x{REPS}")
        f_xla = jax.jit(lambda x: loop(lambda c: jax.nn.leaky_relu(
            jax.lax.conv_general_dilated(
                c, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(c.dtype),
            0.2), x))
        t_x = timeit(f"  xla conv3x3    {H}", f_xla, x)
        f_pl = jax.jit(lambda x: loop(
            lambda c: conv3x3_small(c, k, b, act="lrelu"), x))
        t_p = timeit(f"  pallas conv3x3 {H}", f_pl, x)
        gmac = H * H * C * C * 9 / 1e9
        log(f"  => conv3x3 {H}: xla {t_x*1000/REPS:.2f} vs pallas "
            f"{t_p*1000/REPS:.2f} ms/call ({t_x/t_p:.2f}x); roofline "
            f"{gmac * 2 / 197:.2f} ms bf16")

    # full RRDB per-frame A/B (device-u8 path, s2d body both arms)
    ckpt = _synth_rrdb_ckpt()
    x = jnp.asarray(
        (np.random.RandomState(1).rand(1, 512, 512, 3) * 255).astype(np.uint8))
    for flag in ("0", "1", "0", "1"):  # interleaved: session drift visible
        os.environ["CONTROLANIMATE_UP_KERNEL"] = flag
        u = Upscaler(4.0, model_path=ckpt, num_block=6, dtype=jnp.bfloat16)
        timeit(f"rrdb full frame 512->2048 [up_kernel={flag}]",
               u.upscale_batch_device, x, iters=4)
    os.environ.pop("CONTROLANIMATE_UP_KERNEL", None)


def _device_op_table(fn, n=3, top=30):
    """Trace `fn()` n times, aggregate device-track events by op name."""
    import glob
    import gzip
    import json as _json
    import tempfile

    tdir = tempfile.mkdtemp(prefix="optrace_")
    jax.profiler.start_trace(tdir)
    for _ in range(n):
        out = fn()
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        log("no trace captured")
        return {}
    with gzip.open(paths[-1], "rt") as f:
        trace = _json.load(f)
    events = trace.get("traceEvents", [])
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = str(e.get("args", {}).get("name", ""))
            if "TPU" in nm or "/device:" in nm or "XLA" in nm.upper():
                dev_pids.add(e.get("pid"))
    agg: dict = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        a = agg.setdefault(e.get("name", "?"), [0.0, 0])
        a[0] += e.get("dur", 0) / 1e3
        a[1] += 1
    total = sum(v[0] for v in agg.values())
    log(f"{len(agg)} distinct device ops, {total:.1f} ms over {n} calls")
    for name, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        log(f"  {ms:8.2f} ms x{cnt:3d}  {name[:110]}")
    return agg


def bench_upktrace():
    """Why is the pallas up-stage 3.2x SLOWER in-context when every kernel
    wins standalone (perf/upconv_r5)? Trace the full device-u8 RRDB with
    CONTROLANIMATE_UP_KERNEL=1 and show where the ~234 ms/frame goes."""
    import os

    import numpy as np

    from controlanimate_tpu.models.upscaler import Upscaler

    ckpt = _synth_rrdb_ckpt()
    x = jnp.asarray(
        (np.random.RandomState(1).rand(1, 512, 512, 3) * 255).astype(np.uint8))
    for flag in ("1", "0"):
        os.environ["CONTROLANIMATE_UP_KERNEL"] = flag
        u = Upscaler(4.0, model_path=ckpt, num_block=6, dtype=jnp.bfloat16)
        timeit(f"warm rrdb [up_kernel={flag}]", u.upscale_batch_device, x, iters=2)
        # streamed: dispatch N frames back-to-back, sync once — the product
        # rate (the orchestrator defers emit past the next dispatch), hides
        # the per-program tunnel launch gap that best-of-sync measures
        n = 8
        t0 = time.time()
        outs = [u.upscale_batch_device(x) for _ in range(n)]
        for o in outs:
            float(o.astype(jnp.float32).sum())
        log(f"rrdb streamed x{n} [up_kernel={flag}]: "
            f"{(time.time() - t0) * 1000 / n:.2f} ms/frame")
        log(f"--- device op table, up_kernel={flag}")
        _device_op_table(lambda: u.upscale_batch_device(x), n=2)
    # realistic window batch: the orchestrator hands the upscaler a window's
    # novel frames at once; the split's two launch floors amortize over the
    # body/tail chunk sizes (body 8, tail ~4 at 512->2048)
    xb = jnp.asarray(
        (np.random.RandomState(2).rand(8, 512, 512, 3) * 255).astype(np.uint8))
    # emit=fine dropped: Mosaic can't lower the px lane interleave on real
    # TPU ("Only 2D gather is supported", /tmp/tpu_upsplit4_r5.log)
    for flag, emit in (("1", "rows"), ("0", ""), ("1", "rows")):
        os.environ["CONTROLANIMATE_UP_KERNEL"] = flag
        os.environ["CONTROLANIMATE_UPK_EMIT"] = emit or "rows"
        u = Upscaler(4.0, model_path=ckpt, num_block=6, dtype=jnp.bfloat16)
        t = timeit(f"rrdb batch8 512->2048 [up_kernel={flag} emit={emit or '-'}]",
                   u.upscale_batch_device, xb, iters=3)
        log(f"  => per-frame {t * 1000 / 8:.2f} ms")
    os.environ.pop("CONTROLANIMATE_UP_KERNEL", None)
    os.environ.pop("CONTROLANIMATE_UPK_EMIT", None)


def _fusion_scope_maps(hlo: str):
    """Parse compiled HLO text into (comp_ops, fusion_calls): per-computation
    (opcode, op_name-metadata) lists and the fusion->computation call map, so
    trace event names (fusion.NNNN) resolve to model-scope paths."""
    import collections
    import re

    comp_ops: dict = collections.defaultdict(list)
    cur = None
    for line in hlo.splitlines():
        mdef = re.match(r"\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", line) if "{" in line else None
        if mdef and line.rstrip().endswith("{"):
            cur = mdef.group(1)
            continue
        if line.strip() == "}":
            cur = None
            continue
        if cur is None:
            continue
        om = re.search(r"op_name=\"([^\"]+)\"", line)
        opm = re.match(r"\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[^ ]+\s+(\w+)", line)
        opcode = opm.group(1) if opm else ""
        if om or opcode:
            comp_ops[cur].append((opcode, om.group(1) if om else ""))
    fusion_calls = dict(re.findall(
        r"%?([\w.\-]+)\s*=\s*[^=]*fusion\([^)]*\).*?calls=%?([\w.\-]+)", hlo))
    return comp_ops, fusion_calls


def _scopes_fn(comp_ops, fusion_calls):
    def scopes(name: str, k: int = 2) -> str:
        seen: list = []
        for _, nm in comp_ops.get(fusion_calls.get(name, name), []):
            s = "/".join(p for p in nm.split("/") if p)[:70]
            if s and s not in seen:
                seen.append(s)
            if len(seen) >= k:
                break
        return " | ".join(seen) or "?"
    return scopes


def _leaf_fusion_trace(run_once, tdir: str):
    """Trace one call and return (per_fusion ms, per_fusion counts, span_ms).

    Leaf events only: the device track nests container spans (the whole
    jitted program, the scan's while loop) over the fusion spans — summing
    every ph=X double-counts ~2x. Sweep each (pid,tid) sorted by start with
    an open-interval stack; an event that contains a later event is a
    parent and is dropped. Container names (jit_*/while/body/condition) are
    also excluded by name for tracks where nesting can't catch them."""
    import collections
    import glob
    import gzip
    import json as _json
    import re

    jax.profiler.start_trace(tdir)
    run_once()
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        return {}, {}, 0.0
    with gzip.open(paths[-1], "rt") as f:
        trace = _json.load(f)
    events = trace.get("traceEvents", [])
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = str(e.get("args", {}).get("name", ""))
            if "TPU" in nm or "/device:" in nm or "XLA" in nm.upper():
                dev_pids.add(e.get("pid"))
    by_track: dict = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        nm = e.get("name", "?")
        if re.match(r"(jit_|while(\.\d+)?$|body(\.\d+)?$|condition(\.\d+)?$)", nm):
            continue
        by_track[(e.get("pid"), e.get("tid"))].append(
            (float(e.get("ts", 0)), float(e.get("dur", 0)), nm))
    per_fusion: dict = collections.defaultdict(float)
    counts: dict = collections.defaultdict(int)
    for evs in by_track.values():
        evs.sort(key=lambda t: (t[0], -t[1]))
        stack: list = []  # (end, name, dur, is_parent[mutable])

        def pop_until(ts):
            while stack and stack[-1][0] <= ts + 1e-9:
                end, name, dur, is_parent = stack.pop()
                if not is_parent[0]:
                    per_fusion[name] += dur / 1e3
                    counts[name] += 1

        for ts, dur, name in evs:
            pop_until(ts)
            for fr in stack:
                fr[3][0] = True  # anything still open contains this event
            stack.append((ts + dur, name, dur, [False]))
        pop_until(float("inf"))
    span_ms = max((float(e.get("dur", 0)) / 1e3 for e in events
                   if e.get("ph") == "X" and e.get("pid") in dev_pids),
                  default=0.0)
    return per_fusion, counts, span_ms


def bench_denacct():
    """Denoise MFU accounting (VERDICT r4 next #5): turn 'denoise is near
    the floor' into arithmetic. Traces the F=24 LCM 4-step denoise program,
    joins every device fusion's time with its HLO metadata (op_name scopes
    name the flax modules), classifies into roofline components, and prints
    a table whose components sum to the measured total, next to analytic
    floors (MXU-useful FLOPs, the D=40->128 attention pad, softmax VPU,
    norm/elementwise HBM traffic)."""
    import collections
    import re

    import bench

    F, size, steps, ov = 24, 512, 4, 8
    if os.environ.get("CONTROLANIMATE_DENACCT_SMALL"):  # CPU smoke of the probe path
        F, size, ov = 2, 128, 1
    cfg = bench.RunConfig(
        width=size, height=size, frame_count=F, overlap_length=ov,
        use_lcm=True, steps=steps, guidance_scale=7.5, strength=0.9,
        overlap_strength=0.9, lcm_origin_steps=50, prompt="a cat",
        n_prompt="", seed=7, dtype="bfloat16",
    )
    pipeline = bench.build_pipeline(cfg)
    eng = pipeline.engine
    # address the engine's ALREADY-COMPILED shipped program (native-LCM,
    # no-CFG, w-embedding) exactly like bench.measure_mfu — a hand-built
    # WindowStatic that misses a field (e.g. use_lcm) silently measures a
    # different program (first capture measured the CFG-doubled one: 1743ms)
    st = pipeline.window_static(overlaps=0, has_input_frames=True)
    sched = eng.build_scheduler(st)
    denoise = eng._make_denoise_fn(st, sched)
    key = jax.random.PRNGKey(0)
    d_ctx = eng.m.unet.config.cross_attention_dim
    text = jax.random.normal(key, (1, 77, d_ctx), jnp.bfloat16)
    lat = jax.random.normal(key, (1, F, size // 8, size // 8, 4), jnp.float32)
    args = (eng.m.unet_params, (), text, (), lat, key)

    jd = denoise
    smoke = bool(os.environ.get("CONTROLANIMATE_DENACCT_SMALL"))
    t_meas = timeit("denoise F=24 LCM4", jd, *args, iters=1 if smoke else 3)

    # --- fusion -> metadata map from the compiled HLO text ---------------
    hlo = jd.lower(*args).compile().as_text()
    comp_ops, fusion_calls = _fusion_scope_maps(hlo)

    def classify(name: str) -> str:
        ops = comp_ops.get(fusion_calls.get(name, name), [])
        names = " ".join(o[1] for o in ops)
        codes = {o[0] for o in ops}
        has_dot = "dot" in codes or "convolution" in codes
        if "motion_modules" in names:
            return "motion module (VPU attn + FFN/proj)"
        # attention first: the level-0 spatial-attn fusions carry fused 1x1
        # projection convs, so a conv-opcode check would swallow them
        if re.search(r"attn1|attn2|attention|to_q|to_k|to_v|to_out", names):
            if "exponential" in codes or "divide" in codes:
                return "spatial/cross attn softmax (VPU)"
            if has_dot:
                return "spatial/cross attn (MXU matmuls, D=40 pad + fused projs)"
            return "spatial/cross attn other"
        if "convolution" in codes:
            return "conv (resnets/proj/conv_in-out)"
        if re.search(r"ff|geglu|net_0|net_2|proj", names) and has_dot:
            return "FFN/GEGLU + projections (MXU)"
        if has_dot:
            return "other matmul"
        if re.search(r"norm|group_norm|layer_norm", names):
            return "norms + elementwise (HBM-bound)"
        if re.search(r"scheduler|step|add_noise|scale_model", names):
            return "scheduler math"
        return "elementwise/other"

    scopes = _scopes_fn(comp_ops, fusion_calls)

    # --- traced device times ---------------------------------------------
    def run_once():
        out = jd(*args)
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())

    per_fusion, fusion_calls_n, span_ms = _leaf_fusion_trace(
        run_once, "/tmp/denacct_trace")
    if not per_fusion:
        log("no trace captured")
        return
    total_dev = sum(per_fusion.values())

    per_comp: dict = collections.defaultdict(float)
    comp_examples: dict = collections.defaultdict(list)
    for name, ms in per_fusion.items():
        c = classify(name)
        per_comp[c] += ms
        comp_examples[c].append((ms, name))
    log(f"measured wall best {t_meas*1000:.1f} ms; device leaf-fusion total "
        f"{total_dev:.1f} ms; outer program span {span_ms:.1f} ms -> "
        f"inter-fusion scheduling gaps {max(span_ms - total_dev, 0.0):.1f} ms")
    for c, ms in sorted(per_comp.items(), key=lambda kv: -kv[1]):
        ex = sorted(comp_examples[c], reverse=True)[:3]
        log(f"  {ms:8.1f} ms ({100*ms/max(total_dev,1e-9):5.1f}%)  {c}")
        for ems, en in ex:
            log(f"      {ems:7.2f} ms  {en[:40]:40s}  {scopes(en)}")
    log("top fusions (summed over the scan's steps):")
    for en, ms in sorted(per_fusion.items(), key=lambda kv: -kv[1])[:12]:
        n = fusion_calls_n[en]
        log(f"  {ms:8.2f} ms  x{n:<3d} ({ms/max(n,1):6.2f} ms/call)  "
            f"{en[:36]:36s}  {scopes(en, 3)}")

    # --- analytic floors (exact jaxpr walks, utils/flops.py) ---------------
    from controlanimate_tpu.utils.flops import (
        PEAK_BF16_TFLOPS, count_flops, count_flops_padded)

    peak = PEAK_BF16_TFLOPS * 1e12
    f_useful = count_flops(denoise, *args)
    f_padded = count_flops_padded(denoise, *args)
    log(f"floors: MXU-useful {f_useful/1e12:.2f} TFLOP -> "
        f"{f_useful/peak*1e3:.1f} ms | MXU tile-padded "
        f"{f_padded/1e12:.2f} TFLOP -> {f_padded/peak*1e3:.1f} ms "
        f"(pad tax {f_padded/f_useful:.2f}x; D=40 attention + C<128 convs)")
    log(f"accounting: measured {t_meas*1000:.1f} ms = padded-MXU floor "
        f"{f_padded/peak*1e3:.1f} ms + VPU/HBM components from the table "
        f"above (softmax, norms, elementwise) + scheduling gaps")


def bench_tome():
    """ToMe-SD token merging in-context A/B (the denacct follow-up:
    perf/denacct_r5.json proved the level-0 spatial attns are at their
    per-kernel floor, so only token-count reduction moves the 455 ms attn
    slice). Measures the SHIPPED F=24 LCM denoise program vs
    token_merge_ratio 0.3 / 0.5 (ops/token_merge.py), same random weights
    (bench.build_pipeline seeds PRNGKey(0) identically), plus decoded-frame
    SSIM vs the exact run — adversarial on random weights, same caveat as
    the encoder-propagation bench line."""
    import numpy as np

    import bench
    from scripts.eval_quality import psnr, ssim

    F, size, steps = 24, 512, 4
    base = dict(
        width=size, height=size, frame_count=F, overlap_length=8,
        use_lcm=True, steps=steps, guidance_scale=7.5, strength=0.9,
        overlap_strength=0.9, lcm_origin_steps=50, prompt="a cat",
        n_prompt="", seed=7, dtype="bfloat16",
    )
    key = jax.random.PRNGKey(0)
    times, frames_by_ratio = {}, {}
    arms = [(0.0, False), (0.3, False), (0.5, False), (0.5, True)]
    for ratio, motion in arms:
        cfg = bench.RunConfig(**base, token_merge_ratio=ratio,
                              token_merge_motion=motion)
        p = bench.build_pipeline(cfg)
        eng = p.engine
        st = p.window_static(overlaps=0, has_input_frames=True)
        sched = eng.build_scheduler(st)
        denoise = eng._make_denoise_fn(st, sched)
        decode = eng._make_decode_fn(st.output_uint8, st.decode_chunk)
        d_ctx = eng.m.unet.config.cross_attention_dim
        text = jax.random.normal(key, (1, 77, d_ctx), jnp.bfloat16)
        lat = jax.random.normal(key, (1, F, size // 8, size // 8, 4), jnp.float32)
        args = (eng.m.unet_params, (), text, (), lat, key)
        arm = (ratio, motion)
        times[arm] = timeit(
            f"tome denoise F=24 LCM4 ratio={ratio} motion={motion}",
            denoise, *args, iters=3)
        lat2 = denoise(*args)
        frames_by_ratio[arm] = np.asarray(
            jax.device_get(decode(eng.m.vae_params, lat2))
        )
        del p, eng, denoise, decode, lat2  # free HBM before the next build

    exact = (0.0, False)
    f0 = frames_by_ratio[exact]
    for arm in arms[1:]:
        fr = frames_by_ratio[arm]
        pairs = list(zip(f0.reshape((-1,) + f0.shape[-3:]),
                         fr.reshape((-1,) + fr.shape[-3:])))
        s = float(np.mean([ssim(a, b) for a, b in pairs]))
        pn = float(np.mean([psnr(a, b) for a, b in pairs]))
        log(f"tome ratio={arm[0]} motion={arm[1]}: denoise "
            f"{times[arm]*1e3:.1f} ms "
            f"({times[exact]/times[arm]:.2f}x vs exact {times[exact]*1e3:.1f}); "
            f"SSIM {s:.4f} PSNR {pn:.2f} dB vs exact decode "
            f"(RANDOM weights: adversarial worst case — token similarity "
            f"structure of trained UNet features is absent)")


def bench_tomehi():
    """ToMe at HIGH resolution — where it should win. At 512px (N=4096)
    level-0 attention is ~19% of denoise and the merge's data movement eats
    the saving (bench_tome: parity). Attention cost scales N² while merge
    overhead scales N, so at 768px (N=9216, flash-forced for both arms by
    the engine's HBM rule — exact XLA logits would be 21.7GB) the balance
    flips. F=16 LCM 4-step, exact vs ratio 0.5 vs 0.5+motion."""
    import numpy as np

    import bench

    geom = os.environ.get("CONTROLANIMATE_TOMEHI_GEOM", "768x768x16")
    w, h, F = (int(v) for v in geom.split("x"))
    steps = 4
    base = dict(
        width=w, height=h, frame_count=F, overlap_length=8,
        use_lcm=True, steps=steps, guidance_scale=7.5, strength=0.9,
        overlap_strength=0.9, lcm_origin_steps=50, prompt="a cat",
        n_prompt="", seed=7, dtype="bfloat16",
    )
    key = jax.random.PRNGKey(0)
    times = {}
    for ratio, motion in [(0.0, False), (0.5, False), (0.5, True)]:
        cfg = bench.RunConfig(**base, token_merge_ratio=ratio,
                              token_merge_motion=motion)
        p = bench.build_pipeline(cfg)
        eng = p.engine
        st = p.window_static(overlaps=0, has_input_frames=True)
        denoise = eng._make_denoise_fn(st, eng.build_scheduler(st))
        d_ctx = eng.m.unet.config.cross_attention_dim
        text = jax.random.normal(key, (1, 77, d_ctx), jnp.bfloat16)
        lat = jax.random.normal(key, (1, F, h // 8, w // 8, 4), jnp.float32)
        args = (eng.m.unet_params, (), text, (), lat, key)
        times[(ratio, motion)] = timeit(
            f"tomehi denoise F={F} {w}x{h} ratio={ratio} motion={motion}",
            denoise, *args, iters=3)
        del p, eng, denoise
    exact = times[(0.0, False)]
    for arm, t in times.items():
        log(f"tomehi {geom} {arm}: {t*1e3:.1f} ms ({exact/t:.2f}x vs exact)")


def bench_tometrace():
    """Trace the token_merge_ratio=0.5 F=24 LCM denoise program: the A/B
    (bench_tome) measured it NET SLOWER than exact (1222 vs 1108 ms) with
    overhead growing in r — find where the plan/merge overhead goes
    (sim matmul / argsort / scatter-add / gathers) before optimizing."""
    import bench

    F, size, steps = 24, 512, 4
    cfg = bench.RunConfig(
        width=size, height=size, frame_count=F, overlap_length=8,
        use_lcm=True, steps=steps, guidance_scale=7.5, strength=0.9,
        overlap_strength=0.9, lcm_origin_steps=50, prompt="a cat",
        n_prompt="", seed=7, dtype="bfloat16",
        token_merge_ratio=float(os.environ.get("CONTROLANIMATE_TOME_RATIO", "0.5")),
    )
    p = bench.build_pipeline(cfg)
    eng = p.engine
    st = p.window_static(overlaps=0, has_input_frames=True)
    denoise = eng._make_denoise_fn(st, eng.build_scheduler(st))
    key = jax.random.PRNGKey(0)
    d_ctx = eng.m.unet.config.cross_attention_dim
    text = jax.random.normal(key, (1, 77, d_ctx), jnp.bfloat16)
    lat = jax.random.normal(key, (1, F, size // 8, size // 8, 4), jnp.float32)
    args = (eng.m.unet_params, (), text, (), lat, key)
    t = timeit(f"tome denoise ratio={cfg.token_merge_ratio}", denoise, *args, iters=3)

    comp_ops, fusion_calls = _fusion_scope_maps(
        denoise.lower(*args).compile().as_text())
    scopes = _scopes_fn(comp_ops, fusion_calls)

    def run_once():
        out = denoise(*args)
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())

    per_fusion, counts, span_ms = _leaf_fusion_trace(run_once, "/tmp/tometrace")
    total = sum(per_fusion.values())
    log(f"wall {t*1e3:.1f} ms; device leaf total {total:.1f} ms; span {span_ms:.1f}")
    log("top fusions:")
    for en, ms in sorted(per_fusion.items(), key=lambda kv: -kv[1])[:30]:
        ops = comp_ops.get(fusion_calls.get(en, en), [])
        codes = sorted({o[0] for o in ops if o[0]})[:8]
        log(f"  {ms:8.2f} ms x{counts[en]:<3d} ({ms/max(counts[en],1):6.2f}/call) "
            f"{en[:34]:34s} [{','.join(codes)[:60]}] {scopes(en)}")
    # aggregate by opcode family for the tome ops specifically
    agg: dict = {}
    for en, ms in per_fusion.items():
        ops = comp_ops.get(fusion_calls.get(en, en), [])
        codes = {o[0] for o in ops}
        fam = ("sort" if "sort" in codes else
               "scatter" if "scatter" in codes else
               "gather" if "gather" in codes else
               "dot/conv" if codes & {"dot", "convolution"} else "other")
        agg[fam] = agg.get(fam, 0.0) + ms
    log("by family: " + "  ".join(f"{k} {v:.1f}ms" for k, v in
                                  sorted(agg.items(), key=lambda kv: -kv[1])))


def bench_upscale4():
    """The shipped LCM profiles run upscale 4 through RealESRGAN (reference
    SampleConfigLCM*.yaml:96 'upscale: 4'; LCMLoRA ships use_face_enhancer 0
    -> the device-RRDB emit path). Measure the FULL orchestrator at the
    overlap-8 F=24 workload with a synthetic anime_6B-geometry RRDBNet,
    bf16 (the run dtype — reference runs RealESRGANer half=True) vs f32,
    same session. Compare against the upscale-1 bench line to price the
    upscaler into the shipped profile."""
    import tempfile

    import numpy as np

    import bench
    from controlanimate_tpu.io.media import ArrayFrameSource
    from controlanimate_tpu.models.upscaler import Upscaler
    from scripts.vid2vid import vid2vid

    ckpt = _synth_rrdb_ckpt()

    F, ov, windows = 24, 8, 8
    total = F + (windows - 1) * (F - ov)
    frames_in = (np.random.RandomState(1).rand(total, 512, 512, 3) * 255).astype(np.uint8)
    with tempfile.TemporaryDirectory() as td:
        cfg = bench.RunConfig(
            width=512, height=512, frame_count=F, overlap_length=ov,
            use_lcm=True, steps=4, guidance_scale=7.5, strength=0.9,
            overlap_strength=0.9, lcm_origin_steps=50, prompt="a cat",
            n_prompt="", seed=7, dtype="bfloat16", output_video_dir=td,
            upscale=4.0, checkpoint_interval=0,
        )
        pipeline = bench.build_pipeline(cfg)
        # bf16-rerun: same config as the first arm, after the session is fully
        # warm — separates tunnel-session ordering/warmup from a real dtype
        # effect (r4 first capture: bf16-first lost 22% in-context where the
        # standalone upchunk probe showed only 4.5%)
        for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32),
                            ("bf16-rerun", jnp.bfloat16)):
            upscaler = Upscaler(4.0, model_path=ckpt, num_block=6, dtype=dt)
            for tag in ("cold", "warm"):
                sink = yuv_sink()
                t0 = time.time()
                s = vid2vid(config=cfg, pipeline=pipeline,
                            frame_source=ArrayFrameSource(frames_in),
                            frame_sink=sink, upscaler=upscaler)
                wall = time.time() - t0
                log(f"upscale4[{dt_name}] {tag}: {s['frames_written']} frames"
                    f" / {s['windows']} windows in {wall:.1f}s -> "
                    f"{s['frames_written'] / wall:.2f} emitted fps | timers "
                    f"{ {k: round(v['total_s'], 2) for k, v in s.get('timers', {}).items()} }")


def bench_flashsweep():
    """Block-size sweep of the Pallas flash kernel at the level-0 denoise
    hotspot (profiler: 5 fusions x 10.5 ms/step; MXU floor with the D40->128
    pad is ~5.6 ms, XLA's fused form ~9.9, current flash ~12.2 — if a block
    config lands under XLA's, the bounded_memory path speeds up F>=32
    windows and the dispatch table may flip). In-scan (loop-in-jit x8), the
    regime the denoise program actually runs in."""
    import functools

    from controlanimate_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    for shape in ((16, 4096, 8, 40), (32, 4096, 8, 40)):
        ks = jax.random.split(key, 3)
        q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)

        def loop(fn, q, k, v, n=8):
            def body(c, _):
                return fn(c, k, v), ()
            out, _ = jax.lax.scan(body, q, None, length=n)
            return out

        log(f"--- flashsweep {shape}")
        f_xla = jax.jit(lambda q, k, v: loop(jax.nn.dot_product_attention, q, k, v))
        timeit("  xla-fused (in-scan baseline)", f_xla, q, k, v)
        for bq in (256, 512, 1024, 2048, 4096):
            fn = functools.partial(flash_attention, block_q=bq)
            f = jax.jit(lambda q, k, v, fn=fn: loop(fn, q, k, v))
            timeit(f"  flash bq={bq}", f, q, k, v)


def bench_eulerab():
    """Euler 30-step denoise: XLA fused attention (new default after the
    force_flash context replaced the shape-based HBM rule) vs flash-forced
    at level-0 — same session, both from one weight set."""
    import bench
    from controlanimate_tpu.ops import attention as attn_mod
    from controlanimate_tpu.pipelines.engine import AnimationEngine, EngineModels, WindowStatic

    cfg = bench.RunConfig(
        width=512, height=512, frame_count=16, overlap_length=8,
        scheduler="EulerDiscreteScheduler", steps=30, guidance_scale=7.5,
        strength=1.0, prompt="a cat", n_prompt="", seed=7, dtype="bfloat16",
    )
    pipeline = bench.build_pipeline(cfg)
    st = WindowStatic(
        scheduler_name="EulerDiscreteScheduler", steps=30, guidance_scale=7.5,
        strength=1.0, frame_count=16, height=512, width=512, output_uint8=True,
    )
    key = jax.random.PRNGKey(0)
    text = jax.random.normal(key, (2, 77, 768), jnp.bfloat16)
    lat = jax.random.normal(key, (1, 16, 64, 64, 4), jnp.float32)

    eng = pipeline.engine
    sched = eng.build_scheduler(st)
    den = eng._make_denoise_fn(st, sched)
    timeit("euler denoise [xla]", den, eng.m.unet_params, (), text, (), lat, key, iters=2)

    eng2 = AnimationEngine(eng.m, eng.schedule)
    den2 = eng2._make_denoise_fn(st, sched)

    def flashed(*a):
        # global enable (equivalent to the bounded_memory context here:
        # both force the Pallas kernel at seq >= 256)
        attn_mod.set_pallas_enabled(True)
        try:
            return den2(*a)
        finally:
            attn_mod.set_pallas_enabled(False)

    timeit("euler denoise [flash-l0]", flashed, eng.m.unet_params, (), text, (), lat, key, iters=2)


def bench_ablate():
    """UNet component ablations: where do the 600ms go?"""
    from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    key = jax.random.PRNGKey(0)
    B, F, h, w = 2, 16, 64, 64
    sample = jax.random.normal(key, (B, F, h, w, 4), jnp.bfloat16)
    t = jnp.asarray([500, 500])
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)

    variants = {
        "full": UNet3DConfig(),
        "no_motion": UNet3DConfig(use_motion_module=False),
        "conv_only": UNet3DConfig(
            use_motion_module=False,
            down_block_types=("DownBlock3D",) * 4,
            up_block_types=("UpBlock3D",) * 4,
        ),
    }
    for name, cfg in variants.items():
        model = UNet3DConditionModel(cfg, dtype=jnp.bfloat16)
        params = jax.jit(
            lambda k: model.init(
                k, jnp.zeros((1, 2, 8, 8, 4), jnp.bfloat16), jnp.asarray([1]), ctx[:1]
            )["params"]
        )(key)
        f = jax.jit(lambda p, s, t, c: model.apply({"params": p}, s, t, c))
        timeit(f"unet[{name}]", f, params, sample, t, ctx)

    # pallas on/off comparison for the full unet
    from controlanimate_tpu.ops import attention as attn_mod

    attn_mod.set_pallas_enabled(True)
    model = UNet3DConditionModel(UNet3DConfig(), dtype=jnp.bfloat16)
    params = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((1, 2, 8, 8, 4), jnp.bfloat16), jnp.asarray([1]), ctx[:1]
        )["params"]
    )(key)
    f = jax.jit(lambda p, s, t, c: model.apply({"params": p}, s, t, c))
    timeit("unet[full, pallas-attn]", f, params, sample, t, ctx)
    attn_mod.set_pallas_enabled(False)


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"attn", "unet", "vae"}
    if "cpu" in which:
        # true CPU smoke: a plain JAX_PLATFORMS env var does NOT override
        # the force-registered axon platform; this config update does
        jax.config.update("jax_platforms", "cpu")
        which.discard("cpu")
    if "cache" in which:
        # persistent compilation cache probe: run the same sweep twice in two
        # processes; if the second run's compile+first collapses, the cache
        # survives the remote-compile tunnel
        jax.config.update("jax_compilation_cache_dir", str(Path(__file__).resolve().parent.parent / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        log("compilation cache enabled")
    log(f"device: {jax.devices()[0]}")
    if "attn" in which:
        bench_attention()
    if "attn2" in which:
        bench_attn_blocks()
    if "attnloop" in which:
        bench_attn_loop()
    if "convloop" in which:
        bench_conv_loop()
    if "motionloop" in which:
        bench_motion_loop()
    if "denoise2" in which:
        bench_denoise()
    if "euler" in which:
        bench_euler()
    if "e2e" in which:
        bench_e2e_loop()
    if "segments" in which:
        bench_segments()
    if which & {"bigwin", "bigwin24", "bigwin32"}:
        bench_bigwin()
    if "programs24" in which:
        bench_programs(24)
    if "f24opt" in which:
        bench_f24opt()
    if "f24v2" in which:
        bench_f24v2()
    if "eulerab" in which:
        bench_eulerab()
    if "hbmchunk" in which:
        bench_hbmchunk()
    if "int8" in which:
        bench_int8()
    if "flashsweep" in which:
        bench_flashsweep()
    if "upscale4" in which:
        bench_upscale4()
    if "upchunk" in which:
        bench_upchunk()
    if "uptrace" in which:
        bench_uptrace()
    if "upconv" in which:
        bench_upconv()
    if "denacct" in which:
        bench_denacct()
    if "tome" in which:
        bench_tome()
    if "tometrace" in which:
        bench_tometrace()
    if "tomehi" in which:
        bench_tomehi()
    if "upktrace" in which:
        bench_upktrace()
    if "banded" in which:
        bench_banded()
    if "attnxl" in which:
        bench_attn_xl()
    if "vae2" in which:
        bench_vae_fused()
    if "unet" in which:
        bench_unet()
    if "vae" in which:
        bench_vae()
    if "ablate" in which:
        bench_ablate()
    if "vaeablate" in which:
        bench_vae_ablate()
    if "transfer" in which:
        bench_transfer()
    if "linkprobe" in which:
        bench_linkprobe()
    if "programs" in which:
        bench_programs()
    if "motion" in which:
        bench_motion()
    if "colorops" in which:
        bench_colorops()
    if "vaechunk" in which:
        bench_vae_chunked()
    if "motion2" in which:
        bench_motion_incontext()
    if "window" in which:
        bench_window()
    if "staged" in which:
        bench_window_staged()
    log("DONE")
