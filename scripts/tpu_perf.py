"""One-session TPU performance sweep (the axon tunnel dislikes repeated
short sessions, so all measurements batch into one process).

Usage: python scripts/tpu_perf.py [attn] [unet] [vae] [window]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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

    bench.main(iters=3)


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

    attn_mod.set_pallas_enabled(False)
    model = UNet3DConditionModel(UNet3DConfig(), dtype=jnp.bfloat16)
    params = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((1, 2, 8, 8, 4), jnp.bfloat16), jnp.asarray([1]), ctx[:1]
        )["params"]
    )(key)
    f = jax.jit(lambda p, s, t, c: model.apply({"params": p}, s, t, c))
    timeit("unet[full, xla-attn]", f, params, sample, t, ctx)
    attn_mod.set_pallas_enabled(True)


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"attn", "unet", "vae"}
    log(f"device: {jax.devices()[0]}")
    if "attn" in which:
        bench_attention()
    if "unet" in which:
        bench_unet()
    if "vae" in which:
        bench_vae()
    if "ablate" in which:
        bench_ablate()
    if "vaeablate" in which:
        bench_vae_ablate()
    if "window" in which:
        bench_window()
    log("DONE")
