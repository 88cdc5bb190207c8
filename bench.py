"""Headline benchmark: LCM vid2vid frames/sec/chip at 512x512, 16-frame window.

Matches the driver-defined metric (BASELINE.json) and — unlike round 1 —
measures the PRODUCT path: a facade-constructed ControlAnimatePipeline
(`RunConfig.dtype` policy, uint8 host<->device framing, prompt cache), the
same code `python main.py --config ...` drives. Full SD1.5-geometry
AnimateDiff UNet3D (motion modules v2) + VAE, 4 LCM steps, bfloat16,
single chip. North star: >=10 frames/sec/chip (vs_baseline = value / 10).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

# persistent compilation cache: verified to work through the remote-compile
# tunnel (74MB of executables cached; second run skips the ~180s compile)
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent / ".jax_cache"),
)
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
    ucfg = UNet3DConfig(time_cond_proj_dim=256)  # full SD1.5 + LCM cond + motion v2
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
    jax.block_until_ready(unet_params)

    # full-width CLIP text stack (SD1.5 geometry), tiny BPE vocab
    tok = CLIPTokenizer.tiny()
    tcfg = CLIPTextConfig(
        vocab_size=len(tok.vocab), hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, eos_token_id=tok.eos_token_id,
    )
    tmodel = CLIPTextModel(tcfg, dtype=dtype)
    tparams = tmodel.init(key, jnp.zeros((1, 77), jnp.int32))["params"]

    models = EngineModels(unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params)
    return ControlAnimatePipeline(cfg, models=models, text_stack=TextStack(tok, tmodel, tparams))


def main(frames: int = 16, size: int = 512, steps: int = 4, iters: int = 16):
    dev = jax.devices()[0]
    log(f"device: {dev}")

    cfg = RunConfig(
        width=size, height=size, frame_count=frames, overlap_length=8,
        use_lcm=True, steps=steps, guidance_scale=7.5, strength=0.9,
        lcm_origin_steps=50, prompt="a cat, masterpiece", n_prompt="blurry",
        seed=7, dtype="bfloat16",
    )

    t0 = time.time()
    pipeline = build_pipeline(cfg)
    log(f"init: {time.time() - t0:.1f}s")

    rng = np.random.RandomState(0)
    # distinct per-window frame stacks (a real stream never repeats bytes)
    inputs = [
        (rng.rand(frames, size, size, 3) * 255).astype(np.uint8) for _ in range(3)
    ]

    t0 = time.time()
    out = pipeline.animate(inputs[0], None, overlaps=0, seed=cfg.seed)
    assert out.shape == (frames, size, size, 3) and out.dtype == np.uint8
    log(f"compile + first window: {time.time() - t0:.1f}s")

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
    print(
        json.dumps(
            {
                "metric": f"LCM vid2vid frames/sec/chip ({size}px, {frames}-frame window, {steps} steps, facade path)",
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
