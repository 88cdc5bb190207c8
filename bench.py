"""Headline benchmark: LCM vid2vid frames/sec/chip at 512x512, 16-frame window.

Matches the driver-defined metric (BASELINE.json): full SD1.5-geometry
AnimateDiff UNet3D (motion modules v2) + VAE, 4 LCM steps, one jitted window
program (prepare latents -> scan denoise -> decode), bfloat16, single chip.
North star: >=10 frames/sec/chip (vs_baseline = value / 10).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from controlanimate_tpu.models.vae import AutoencoderKL
from controlanimate_tpu.pipelines.engine import AnimationEngine, EngineModels, WindowStatic
from controlanimate_tpu.schedulers import make_schedule


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(frames: int = 16, size: int = 512, steps: int = 4, iters: int = 5):
    dev = jax.devices()[0]
    log(f"device: {dev}")

    dtype = jnp.bfloat16
    ucfg = UNet3DConfig(time_cond_proj_dim=256)  # full SD1.5 + LCM cond + motion v2
    unet = UNet3DConditionModel(ucfg, dtype=dtype)
    vae = AutoencoderKL(dtype=dtype)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
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
    jax.block_until_ready(unet_params)
    log(f"init: {time.time() - t0:.1f}s")

    engine = AnimationEngine(
        EngineModels(unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params),
        make_schedule(),
    )
    st = WindowStatic(
        steps=steps, use_lcm=True, guidance_scale=7.5, strength=0.9,
        lcm_origin_steps=50, frame_count=frames, height=size, width=size,
    )
    text = jax.random.normal(key, (1, 77, 768), dtype)
    input_frames = jax.random.uniform(key, (1, frames, size, size, 3), jnp.float32) * 2 - 1

    fn = engine.make_window_fn(st)

    def run_once(k):
        out = fn(unet_params, (), text, (), input_frames, None, k)
        # host readback forces real completion (the tunneled TPU path's
        # block_until_ready returns before execution finishes)
        return float(out.astype(jnp.float32).sum())

    t0 = time.time()
    run_once(key)
    log(f"compile + first window: {time.time() - t0:.1f}s")

    times = []
    for i in range(iters):
        t0 = time.time()
        run_once(jax.random.fold_in(key, i))
        times.append(time.time() - t0)
        log(f"window {i}: {times[-1]*1000:.1f} ms")

    best = min(times)
    fps = frames / best
    print(
        json.dumps(
            {
                "metric": f"LCM vid2vid frames/sec/chip ({size}px, {frames}-frame window, {steps} steps)",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        kw[k] = int(v)
    main(**kw)
