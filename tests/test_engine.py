"""End-to-end engine tests: tiny models, full jitted window programs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.config import MotionModuleConfig
from controlanimate_tpu.models.controlnet import ControlNetModel
from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from controlanimate_tpu.models.vae import AutoencoderKL
from controlanimate_tpu.pipelines.engine import (
    AnimationEngine,
    EngineModels,
    WindowStatic,
    get_w_embedding,
)
from controlanimate_tpu.schedulers import make_schedule

UCFG = UNet3DConfig(
    block_out_channels=(8, 16),
    layers_per_block=1,
    down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
    up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
    attention_heads=2,
    cross_attention_dim=16,
    norm_num_groups=4,
    motion=MotionModuleConfig(num_attention_heads=2, temporal_position_encoding_max_len=8),
)
LCM_UCFG = UNet3DConfig(**{**UCFG.__dict__, "time_cond_proj_dim": 8})
CN_CFG = UNet3DConfig(**{**UCFG.__dict__, "use_motion_module": False})


@pytest.fixture(scope="module")
def engine():
    key = jax.random.PRNGKey(0)
    unet = UNet3DConditionModel(UCFG)
    x = jnp.zeros((1, 2, 4, 4, 4))
    ctx = jnp.zeros((1, 7, 16))
    unet_params = unet.init(key, x, jnp.asarray([1]), ctx)["params"]
    vae = AutoencoderKL(block_out_channels=(4, 8, 8, 8), groups=2)
    vae_params = vae.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    cn = ControlNetModel(CN_CFG)
    cn_params = cn.init(
        key, x, jnp.asarray([1]), ctx, jnp.zeros((1, 2, 32, 32, 3))
    )["params"]
    models = EngineModels(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        controlnets=[cn], controlnet_params=[cn_params], cond_scales=[1.0],
    )
    return AnimationEngine(models, make_schedule())


def _embeds(B, L=7, D=16, cfg=True):
    e = jax.random.normal(jax.random.PRNGKey(3), (B, L, D))
    if cfg:
        return jnp.concatenate([jnp.zeros_like(e), e], axis=0)
    return e


def test_txt2vid_cfg_euler(engine):
    st = WindowStatic(
        scheduler_name="EulerDiscreteScheduler", steps=3, guidance_scale=7.5,
        frame_count=2, height=32, width=32,
    )
    # no controlnets in this config: build a frame-free engine view
    eng = AnimationEngine(
        EngineModels(
            unet=engine.m.unet, unet_params=engine.m.unet_params,
            vae=engine.m.vae, vae_params=engine.m.vae_params,
        ),
        engine.schedule,
    )
    out = eng.generate_window(st, _embeds(1), jax.random.PRNGKey(0))
    assert out.shape == (1, 2, 32, 32, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_vid2vid_lcm_with_controlnet(engine):
    st = WindowStatic(
        steps=2, use_lcm=True, guidance_scale=7.5, strength=0.8,
        lcm_origin_steps=50,
    )
    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3)) * 2 - 1
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 32, 32, 3))
    # LCM unet with cond proj
    lcm_unet = UNet3DConditionModel(LCM_UCFG)
    lcm_params = lcm_unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 4, 4, 4)), jnp.asarray([1]),
        jnp.zeros((1, 7, 16)), timestep_cond=jnp.zeros((1, 8)),
    )["params"]
    eng = AnimationEngine(
        EngineModels(
            unet=lcm_unet, unet_params=lcm_params,
            vae=engine.m.vae, vae_params=engine.m.vae_params,
            controlnets=engine.m.controlnets,
            controlnet_params=engine.m.controlnet_params,
            cond_scales=[0.7],
        ),
        engine.schedule,
    )
    st = WindowStatic(**{**st.__dict__})
    out = eng.generate_window(
        st, _embeds(1, cfg=False), jax.random.PRNGKey(0),
        cond_images=[cond], input_frames=frames,
    )
    assert out.shape == (1, 2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_encoder_reuse_window(engine):
    """Encoder propagation (arXiv:2312.09608, opt-in): non-key steps run
    decoder-only against the key step's cached features (post-ControlNet-
    injection). Runs with CFG + a ControlNet; deterministic; stays in range;
    actually changes the numerics vs the full run (it is an approximation,
    not a refactor)."""
    def mk(reuse):
        return WindowStatic(
            scheduler_name="EulerDiscreteScheduler", steps=4,
            guidance_scale=7.5, strength=0.9, encoder_reuse_every=reuse,
        )

    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3)) * 2 - 1
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 32, 32, 3))
    kw = dict(cond_images=[cond], input_frames=frames)
    base = engine.generate_window(mk(0), _embeds(1), jax.random.PRNGKey(3), **kw)
    fast = engine.generate_window(mk(2), _embeds(1), jax.random.PRNGKey(3), **kw)
    fast2 = engine.generate_window(mk(2), _embeds(1), jax.random.PRNGKey(3), **kw)
    assert fast.shape == base.shape
    assert bool(jnp.all(jnp.isfinite(fast)))
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(fast2))
    assert not np.array_equal(np.asarray(fast), np.asarray(base))
    assert float(fast.min()) >= 0.0 and float(fast.max()) <= 1.0


def test_encoder_reuse_rejects_lcm(engine):
    st = WindowStatic(
        steps=4, use_lcm=True, lcm_origin_steps=50, encoder_reuse_every=2,
    )
    with pytest.raises(ValueError, match="encoder_reuse_every"):
        engine.make_window_fn(st)


def test_overlap_noising_pins_overlap_frames(engine):
    """With strength<1 and overlap frames, overlap slots must start from the
    previous outputs: at strength->0 the output should reproduce them."""
    st = WindowStatic(
        scheduler_name="DDIMScheduler", steps=10, guidance_scale=1.0,
        strength=0.1, overlaps=1, has_last_output_frames=True,
    )
    eng = AnimationEngine(
        EngineModels(
            unet=engine.m.unet, unet_params=engine.m.unet_params,
            vae=engine.m.vae, vae_params=engine.m.vae_params,
        ),
        engine.schedule,
    )
    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3)) * 2 - 1
    prev = jnp.zeros((1, 1, 32, 32, 3))  # black previous output
    out = eng.generate_window(
        st, _embeds(1, cfg=False), jax.random.PRNGKey(0),
        input_frames=frames, last_output_frames=prev,
    )
    # the overlap frame (index 0) should be roughly the decoded black frame;
    # both frames derive from prev anchors (not input) since use_img2img=False
    assert out.shape == (1, 2, 32, 32, 3)


def test_cfg_equals_uncond_at_scale_one(engine):
    """guidance_scale=1 disables CFG: the uncond/cond split must vanish."""
    eng = AnimationEngine(
        EngineModels(
            unet=engine.m.unet, unet_params=engine.m.unet_params,
            vae=engine.m.vae, vae_params=engine.m.vae_params,
        ),
        engine.schedule,
    )
    st_cfg = WindowStatic(steps=2, guidance_scale=1.0, frame_count=2, height=32, width=32)
    assert not st_cfg.do_cfg
    e = _embeds(1, cfg=False)
    out = eng.generate_window(st_cfg, e, jax.random.PRNGKey(0))
    assert out.shape == (1, 2, 32, 32, 3)


def test_w_embedding_shape_and_values():
    w = jnp.asarray([7.5])
    emb = get_w_embedding(w, 256)
    assert emb.shape == (1, 256)
    # sin/cos structure: first half sines of w*1000*freqs
    assert abs(float(emb[0, 0]) - np.sin(7500.0)) < 1e-3


def test_window_fn_cached(engine):
    eng = AnimationEngine(
        EngineModels(
            unet=engine.m.unet, unet_params=engine.m.unet_params,
            vae=engine.m.vae, vae_params=engine.m.vae_params,
        ),
        engine.schedule,
    )
    st = WindowStatic(steps=2, guidance_scale=1.0, frame_count=2, height=32, width=32)
    f1 = eng.make_window_fn(st)
    f2 = eng.make_window_fn(st)
    assert f1 is f2


class _SpyControlNet:
    """Wraps a ControlNetModel, recording the context length it receives."""

    def __init__(self, cn):
        self._cn = cn
        self.ctx_lens: list[int] = []

    def apply(self, variables, sample, t, ctx, cond, **kw):
        self.ctx_lens.append(ctx.shape[1])
        return self._cn.apply(variables, sample, t, ctx, cond, **kw)


def _ip_engine(engine, ip_tokens: int, ucfg=None):
    """Engine whose UNet has dual-stream attn2 (ip_tokens) sharing base
    weights with the module-fixture UNet (same init key + param paths)."""
    ucfg = ucfg or UNet3DConfig(**{**UCFG.__dict__, "ip_tokens": ip_tokens})
    unet = UNet3DConditionModel(ucfg)
    ctx = jnp.zeros((1, 7 + ip_tokens, 16))
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 4, 4, 4)), jnp.asarray([1]), ctx
    )["params"]
    return AnimationEngine(
        EngineModels(
            unet=unet, unet_params=params,
            vae=engine.m.vae, vae_params=engine.m.vae_params,
            controlnets=engine.m.controlnets,
            controlnet_params=engine.m.controlnet_params,
            cond_scales=[1.0],
        ),
        engine.schedule,
    )


def test_controlnet_context_is_text_only_under_ip(engine):
    """BUG REGRESSION (VERDICT r1 #1): with IP-Adapter tokens appended, every
    ControlNet must receive the TEXT-ONLY context (reference CNAttnProcessor
    truncation, modules/attention_processor.py:529-532)."""
    ip = 4
    eng = _ip_engine(engine, ip)
    spy = _SpyControlNet(engine.m.controlnets[0])
    eng.m.controlnets = [spy]

    st = WindowStatic(
        scheduler_name="EulerDiscreteScheduler", steps=2, guidance_scale=7.5,
        guess_mode=True, strength=0.9, ipa_scale=0.5, ip_tokens=ip,
    )
    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3)) * 2 - 1
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 32, 32, 3))
    text = _embeds(1, L=7 + ip, cfg=True)  # 7 text + 4 image tokens
    out = eng.generate_window(
        st, text, jax.random.PRNGKey(0), cond_images=[cond], input_frames=frames
    )
    assert out.shape == (1, 2, 32, 32, 3)
    assert spy.ctx_lens and all(n == 7 for n in spy.ctx_lens), spy.ctx_lens


@pytest.mark.slow
def test_ip_scale_zero_equals_text_only_path(engine):
    """With ipa_scale=0 the IP+ControlNet window must equal the text-only
    window bit-for-bit: the UNet's dual-stream branch contributes zero and
    ControlNets see identical (truncated) context. Fails without the
    cn_text truncation (the ControlNet K/V would span 11 tokens)."""
    ip = 4
    eng_ip = _ip_engine(engine, ip)
    # text-only twin with the SAME init key: flax derives per-param RNG from
    # the param path, so all shared paths (everything except to_k_ip/to_v_ip)
    # get identical weights

    unet_base = UNet3DConditionModel(UCFG)
    base_params = unet_base.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 4, 4, 4)), jnp.asarray([1]),
        jnp.zeros((1, 7, 16)),
    )["params"]
    eng_base = AnimationEngine(
        EngineModels(
            unet=unet_base, unet_params=base_params,
            vae=engine.m.vae, vae_params=engine.m.vae_params,
            controlnets=engine.m.controlnets,
            controlnet_params=engine.m.controlnet_params,
            cond_scales=[1.0],
        ),
        engine.schedule,
    )

    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3)) * 2 - 1
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 32, 32, 3))
    text = _embeds(1, L=7, cfg=True)
    zeros_ip = jnp.zeros((text.shape[0], ip, text.shape[-1]))
    text_ip = jnp.concatenate([text, zeros_ip], axis=1)

    st_base = WindowStatic(
        scheduler_name="EulerDiscreteScheduler", steps=2, guidance_scale=7.5,
        strength=0.9,
    )
    st_ip = WindowStatic(**{**st_base.__dict__, "ipa_scale": 0.0, "ip_tokens": ip})

    out_base = eng_base.generate_window(
        st_base, text, jax.random.PRNGKey(0), cond_images=[cond], input_frames=frames
    )
    out_ip = eng_ip.generate_window(
        st_ip, text_ip, jax.random.PRNGKey(0), cond_images=[cond], input_frames=frames
    )
    np.testing.assert_allclose(np.asarray(out_ip), np.asarray(out_base), atol=1e-5)


@pytest.mark.slow
def test_plus_variant_window_num_tokens_16(engine):
    """IP-Adapter-Plus geometry (16 image tokens) through a full window with
    a ControlNet: UNet consumes 7+16 tokens, ControlNet must still see 7
    (reference: ip_adapter.py:352-365 Resampler num_queries=16)."""
    ip = 16
    eng = _ip_engine(engine, ip)
    spy = _SpyControlNet(engine.m.controlnets[0])
    eng.m.controlnets = [spy]
    st = WindowStatic(
        scheduler_name="EulerDiscreteScheduler", steps=2, guidance_scale=7.5,
        strength=0.9, ipa_scale=0.4, ip_tokens=ip,
    )
    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3)) * 2 - 1
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 32, 32, 3))
    out = eng.generate_window(
        st, _embeds(1, L=7 + ip, cfg=True), jax.random.PRNGKey(0),
        cond_images=[cond], input_frames=frames,
    )
    assert out.shape == (1, 2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert spy.ctx_lens and all(n == 7 for n in spy.ctx_lens)


def test_guess_mode_cfg_controlnet(engine):
    """Guess mode + CFG: ControlNet runs on the cond-only half and its
    residuals apply to BOTH CFG branches (the reference relies on B=1 torch
    broadcasting for this, controlanimation_pipeline.py:811-819)."""
    st = WindowStatic(
        scheduler_name="EulerDiscreteScheduler", steps=2, guidance_scale=7.5,
        guess_mode=True, strength=0.9, overlaps=0,
    )
    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3)) * 2 - 1
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 32, 32, 3))
    out = engine.generate_window(
        st, _embeds(1, cfg=True), jax.random.PRNGKey(0),
        cond_images=[cond], input_frames=frames,
    )
    assert out.shape == (1, 2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------------------------
# Full-window golden vs torch (VERDICT r2 #1, part 2): prepare_latents ->
# denoise loop -> decode reimplemented in torch/numpy (reference
# controlanimation_pipeline.py:549-613,790-855,501-514) against
# AnimationEngine end-to-end with identical weights and noise draws.
# ---------------------------------------------------------------------------


def _oracle_models():
    import torch

    from controlanimate_tpu.weights.unet_weights import unet_params_from_torch
    from controlanimate_tpu.weights.vae_weights import vae_params_from_torch
    from torch_mirrors import TorchUNet3D, TorchVAE, randomize_

    vch = (4, 8, 8, 8)
    tvae = TorchVAE(vch, latent_channels=4, groups=2)
    randomize_(tvae, seed=21)
    vae_params = vae_params_from_torch(
        {k: v.numpy() for k, v in tvae.state_dict().items()}, vch
    )
    vae = AutoencoderKL(block_out_channels=vch, groups=2)
    return tvae, vae, vae_params


def _oracle_unet(cfg, seed=22):
    import torch

    from controlanimate_tpu.weights.unet_weights import unet_params_from_torch
    from torch_mirrors import TorchUNet3D, randomize_

    tunet = TorchUNet3D(cfg)
    randomize_(tunet, seed=seed)
    sd = {k: v.numpy() for k, v in tunet.state_dict().items() if "pos_encoder" not in k}
    params, _ = unet_params_from_torch(sd, cfg, motion_sd=sd)
    return tunet, params


def _t_encode(tvae, frames_u8, noise_nhwc, scaling=0.18215):
    """Mirror engine._encode_frames: uint8 -> [-1,1], posterior sample with
    the given normal draws, scale."""
    import torch

    B, F, H, W, _ = frames_u8.shape
    x = frames_u8.astype(np.float32) / 127.5 - 1.0
    with torch.no_grad():
        mean, logvar = tvae.encode_moments(
            torch.tensor(x.reshape(B * F, H, W, 3)).permute(0, 3, 1, 2)
        )
    mean = mean.permute(0, 2, 3, 1).numpy()
    logvar = np.clip(logvar.permute(0, 2, 3, 1).numpy(), -30.0, 20.0)
    z = mean + np.exp(0.5 * logvar) * noise_nhwc
    return (z * scaling).reshape(B, F, *z.shape[1:])


def _t_decode(tvae, lat, scaling=0.18215):
    import torch

    B, F = lat.shape[:2]
    flat = lat.reshape(B * F, *lat.shape[2:])
    with torch.no_grad():
        img = tvae.decode(torch.tensor(flat / scaling).permute(0, 3, 1, 2))
    img = img.permute(0, 2, 3, 1).numpy()
    return np.clip(img / 2 + 0.5, 0.0, 1.0).reshape(B, F, *img.shape[1:])


def _t_unet(tunet, lat, t, ctx, w_emb=None):
    import torch

    B = lat.shape[0]
    with torch.no_grad():
        out = tunet(
            torch.tensor(lat).permute(0, 4, 1, 2, 3),
            torch.full((B,), float(t)).long(),
            torch.tensor(ctx),
            None if w_emb is None else torch.tensor(w_emb),
        )
    return out.permute(0, 2, 3, 4, 1).numpy()


def euler_window_golden_pair():
    """Build the Euler/CFG golden pair (engine output, torch-oracle output)
    at tiny geometry. Used by the default-gate golden test below AND by
    scripts/quality_smoke.py, which turns the same pair into the bench
    artifact's quality line (VERDICT r4 next #7)."""
    tvae, vae, vae_params = _oracle_models()
    tunet, unet_params = _oracle_unet(UCFG)
    models = EngineModels(
        unet=UNet3DConditionModel(UCFG), unet_params=unet_params,
        vae=vae, vae_params=vae_params,
    )
    eng = AnimationEngine(models, make_schedule())

    B, F, H, W, K = 1, 4, 32, 32, 2
    steps, strength, g = 4, 0.8, 7.5
    rng = np.random.RandomState(0)
    input_frames = rng.randint(0, 255, (B, F, H, W, 3), dtype=np.uint8)
    last_frames = rng.randint(0, 255, (B, K, H, W, 3), dtype=np.uint8)
    ctx = rng.randn(2 * B, 7, 16).astype(np.float32) * 0.5

    st = WindowStatic(
        scheduler_name="EulerDiscreteScheduler", steps=steps, strength=strength,
        guidance_scale=g, overlaps=K, has_input_frames=True,
        has_last_output_frames=True,
    )
    key = jax.random.PRNGKey(42)
    out_j = np.asarray(eng.generate_window(
        st, jnp.asarray(ctx), key,
        input_frames=jnp.asarray(input_frames),
        last_output_frames=jnp.asarray(last_frames),
    ))

    # ---- torch/numpy reimplementation ----
    # scheduler tables (diffusers EulerDiscrete semantics, independent impl)
    ts_f = np.linspace(0, 999, steps, dtype=np.float64)[::-1]
    init_t = min(int(steps * strength), steps)
    ts_f = ts_f[max(steps - init_t, 0):]
    betas = np.linspace(0.00085, 0.012, 1000, dtype=np.float64)
    abar = np.cumprod(1.0 - betas)
    sig_table = np.sqrt((1.0 - abar) / abar)
    sigmas = np.concatenate([np.interp(ts_f, np.arange(1000), sig_table), [0.0]])
    ts_round = np.round(ts_f).astype(np.int64)

    # the engine's exact key tree
    k_prep, k_loop = jax.random.split(key)
    k_noise, k_in, k_out = jax.random.split(k_prep, 3)
    lat_shape = (B, F, H // 8, W // 8, 4)
    noise = np.asarray(jax.random.normal(k_noise, lat_shape, jnp.float32))
    n_in = np.asarray(jax.random.normal(k_in, (B * F, H // 8, W // 8, 4), jnp.float32))
    n_out = np.asarray(jax.random.normal(k_out, (B * K, H // 8, W // 8, 4), jnp.float32))

    last_lat = _t_encode(tvae, last_frames, n_out)
    # overlap slots from last outputs, tail from the anchor (use_img2img off,
    # reference :595-604), then noise to the first kept timestep
    anchor = last_lat[:, -1:]
    source = np.concatenate([last_lat, np.broadcast_to(anchor, (B, F - K, *lat_shape[2:]))], axis=1)
    lat = source + sigmas[0] * noise

    for i, (t, sig) in enumerate(zip(ts_round, sigmas[:-1])):
        lat_in = np.concatenate([lat, lat], axis=0) / np.sqrt(sig**2 + 1.0)
        eps = _t_unet(tunet, lat_in.astype(np.float32), t, ctx)
        uncond, cond = eps[:B], eps[B:]
        eps = uncond + g * (cond - uncond)
        x0 = lat - sig * eps
        lat = lat + (lat - x0) / sig * (sigmas[i + 1] - sig)

    out_t = _t_decode(tvae, lat.astype(np.float32))
    return out_j, out_t


def test_window_golden_euler_cfg_vs_torch():
    """Euler/CFG vid2vid window with overlap noising, end to end."""
    out_j, out_t = euler_window_golden_pair()
    err = np.abs(out_j - out_t).max()
    assert err < 2e-3, err


def test_window_golden_lcm_vs_torch():
    """Native-LCM window: origin-strided timesteps, w-embedding, boundary
    scalings, multistep re-noising (reference :731-732,768-771,1143-1269)."""
    tvae, vae, vae_params = _oracle_models()
    tunet, unet_params = _oracle_unet(LCM_UCFG, seed=23)
    models = EngineModels(
        unet=UNet3DConditionModel(LCM_UCFG), unet_params=unet_params,
        vae=vae, vae_params=vae_params,
    )
    eng = AnimationEngine(models, make_schedule())

    B, F, H, W = 1, 4, 32, 32
    steps, strength, g, origin = 2, 0.9, 7.5, 8
    rng = np.random.RandomState(1)
    input_frames = rng.randint(0, 255, (B, F, H, W, 3), dtype=np.uint8)
    ctx = rng.randn(B, 7, 16).astype(np.float32) * 0.5

    st = WindowStatic(
        scheduler_name="LCMScheduler", steps=steps, strength=strength,
        guidance_scale=g, use_lcm=True, lcm_origin_steps=origin,
        has_input_frames=True,
    )
    key = jax.random.PRNGKey(7)
    out_j = np.asarray(eng.generate_window(
        st, jnp.asarray(ctx), key, input_frames=jnp.asarray(input_frames),
    ))

    # LCM timestep table (reference :1162-1170)
    betas = np.linspace(0.00085, 0.012, 1000, dtype=np.float64)
    abar = np.cumprod(1.0 - betas)
    c = 1000 // origin
    origin_ts = np.arange(1, int(origin * strength) + 1) * c - 1
    skipping = max(len(origin_ts) // steps, 1)
    ts = origin_ts[::-skipping][:steps].astype(np.int64)
    ts_next = np.concatenate([ts[1:], [0]])
    scaled = ts.astype(np.float64) * 10.0
    c_skip = 0.5**2 / (scaled**2 + 0.5**2)
    c_out = scaled / np.sqrt(scaled**2 + 0.5**2)

    # w-embedding (reference :477-498): [sin, cos] order
    w = np.full((B,), g * 1000.0)
    half = 4
    emb = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    emb = w[:, None] * emb[None]
    w_emb = np.concatenate([np.sin(emb), np.cos(emb)], axis=1).astype(np.float32)

    k_prep, k_loop = jax.random.split(key)
    k_noise, k_in, k_out = jax.random.split(k_prep, 3)
    lat_shape = (B, F, H // 8, W // 8, 4)
    noise = np.asarray(jax.random.normal(k_noise, lat_shape, jnp.float32))
    n_in = np.asarray(jax.random.normal(k_in, (B * F, H // 8, W // 8, 4), jnp.float32))

    frames_lat = _t_encode(tvae, input_frames, n_in)
    a0 = abar[ts[0]]
    lat = np.sqrt(a0) * frames_lat + np.sqrt(1.0 - a0) * noise

    for i, t in enumerate(ts):
        eps = _t_unet(tunet, lat.astype(np.float32), t, ctx, w_emb=w_emb)
        a_t = abar[t]
        x0 = (lat - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
        denoised = c_out[i] * x0 + c_skip[i] * lat
        if i == len(ts) - 1:
            lat = denoised
        else:
            step_noise = np.asarray(jax.random.normal(
                jax.random.fold_in(k_loop, i), lat.shape, jnp.float32
            ))
            a_n = abar[ts_next[i]]
            lat = np.sqrt(a_n) * denoised + np.sqrt(1.0 - a_n) * step_noise

    out_t = _t_decode(tvae, lat.astype(np.float32))
    err = np.abs(out_j - out_t).max()
    assert err < 2e-3, err


def test_window_golden_lcm_txt2vid_vs_torch():
    """LCM txt2vid overlap window (no input frames — a capability the
    reference's LCM prepare lacks, `torch.stack([])` raises at :592): the
    last outputs' latents fill the overlap slots and the anchor pads the
    rest (reference's non-LCM txt2vid treatment :595-604), then LCM noising
    proceeds as usual. Oracles the engine branch end to end."""
    tvae, vae, vae_params = _oracle_models()
    tunet, unet_params = _oracle_unet(LCM_UCFG, seed=24)
    models = EngineModels(
        unet=UNet3DConditionModel(LCM_UCFG), unet_params=unet_params,
        vae=vae, vae_params=vae_params,
    )
    eng = AnimationEngine(models, make_schedule())

    B, F, H, W, K = 1, 4, 32, 32, 2
    steps, strength, g, origin = 2, 0.9, 7.5, 8
    rng = np.random.RandomState(2)
    last_frames = rng.randint(0, 255, (B, K, H, W, 3), dtype=np.uint8)
    ctx = rng.randn(B, 7, 16).astype(np.float32) * 0.5

    st = WindowStatic(
        scheduler_name="LCMScheduler", steps=steps, strength=strength,
        guidance_scale=g, use_lcm=True, lcm_origin_steps=origin,
        overlaps=K, has_last_output_frames=True,
        frame_count=F, height=H, width=W,
    )
    key = jax.random.PRNGKey(9)
    out_j = np.asarray(eng.generate_window(
        st, jnp.asarray(ctx), key,
        last_output_frames=jnp.asarray(last_frames),
    ))

    betas = np.linspace(0.00085, 0.012, 1000, dtype=np.float64)
    abar = np.cumprod(1.0 - betas)
    c = 1000 // origin
    origin_ts = np.arange(1, int(origin * strength) + 1) * c - 1
    skipping = max(len(origin_ts) // steps, 1)
    ts = origin_ts[::-skipping][:steps].astype(np.int64)
    ts_next = np.concatenate([ts[1:], [0]])
    scaled = ts.astype(np.float64) * 10.0
    c_skip = 0.5**2 / (scaled**2 + 0.5**2)
    c_out = scaled / np.sqrt(scaled**2 + 0.5**2)

    w = np.full((B,), g * 1000.0)
    half = 4
    emb = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    emb = w[:, None] * emb[None]
    w_emb = np.concatenate([np.sin(emb), np.cos(emb)], axis=1).astype(np.float32)

    k_prep, k_loop = jax.random.split(key)
    k_noise, k_in, k_out = jax.random.split(k_prep, 3)
    lat_shape = (B, F, H // 8, W // 8, 4)
    noise = np.asarray(jax.random.normal(k_noise, lat_shape, jnp.float32))
    n_out = np.asarray(jax.random.normal(k_out, (B * K, H // 8, W // 8, 4), jnp.float32))

    last_lat = _t_encode(tvae, last_frames, n_out)
    anchor = last_lat[:, -1:]
    source = np.concatenate(
        [last_lat, np.broadcast_to(anchor, (B, F - K, *lat_shape[2:]))], axis=1
    )
    a0 = abar[ts[0]]
    lat = np.sqrt(a0) * source + np.sqrt(1.0 - a0) * noise

    for i, t in enumerate(ts):
        eps = _t_unet(tunet, lat.astype(np.float32), t, ctx, w_emb=w_emb)
        a_t = abar[t]
        x0 = (lat - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
        denoised = c_out[i] * x0 + c_skip[i] * lat
        if i == len(ts) - 1:
            lat = denoised
        else:
            step_noise = np.asarray(jax.random.normal(
                jax.random.fold_in(k_loop, i), lat.shape, jnp.float32
            ))
            a_n = abar[ts_next[i]]
            lat = np.sqrt(a_n) * denoised + np.sqrt(1.0 - a_n) * step_noise

    out_t = _t_decode(tvae, lat.astype(np.float32))
    err = np.abs(out_j - out_t).max()
    assert err < 2e-3, err


def test_chunked_decode_matches_whole_window(engine):
    """decode_chunk bounds VAE peak HBM via lax.map; frames are independent
    so outputs must be identical."""
    lat = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 4, 4, 4)) * 0.2
    whole = engine._decode_latents(engine.m.vae_params, lat, to_uint8=True)
    chunked = engine._decode_latents(engine.m.vae_params, lat, to_uint8=True, chunk=2)
    # batch-size-dependent reduction order can flip the uint8 rounding by 1
    diff = np.abs(np.asarray(whole).astype(int) - np.asarray(chunked).astype(int))
    assert diff.max() <= 1, diff.max()
