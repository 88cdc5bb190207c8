"""Tests: stitching ops, prompt weighting, LoRA fuse, LDM conversion, TI."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.ops.blending import blend_overlap
from controlanimate_tpu.ops.color_match import hist_match, match_colors, mkl_transfer


def test_hist_match_exact():
    rs = np.random.RandomState(0)
    src = jnp.asarray(rs.rand(1, 8, 8, 3).astype(np.float32))
    ref = jnp.asarray(rs.rand(8, 8, 3).astype(np.float32))
    out = hist_match(src, ref)
    # matched image must have exactly the reference's sorted values per channel
    for c in range(3):
        np.testing.assert_allclose(
            np.sort(np.asarray(out)[0, :, :, c].ravel()),
            np.sort(np.asarray(ref)[:, :, c].ravel()),
            atol=1e-6,
        )


def test_mkl_matches_moments():
    rs = np.random.RandomState(1)
    src = jnp.asarray((rs.rand(16, 16, 3) * 0.5).astype(np.float32))
    ref = jnp.asarray((rs.rand(16, 16, 3) * 0.8 + 0.1).astype(np.float32))
    out = mkl_transfer(src, ref)
    out_flat = np.asarray(out).reshape(-1, 3)
    ref_flat = np.asarray(ref).reshape(-1, 3)
    np.testing.assert_allclose(out_flat.mean(0), ref_flat.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.cov(out_flat.T), np.cov(ref_flat.T), atol=1e-3)


def test_match_colors_pipeline():
    rs = np.random.RandomState(2)
    frames = jnp.asarray(rs.rand(3, 8, 8, 3).astype(np.float32))
    ref = jnp.asarray(rs.rand(8, 8, 3).astype(np.float32))
    out = match_colors(frames, ref)
    assert out.shape == frames.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_match_colors_u8_lut_matches_histogram():
    """The uint8 LUT path must produce EXACT histogram matching for uint8
    data: after matching, the per-channel histogram of the output equals the
    composition through the CDF mapping; and matching a frame to itself is
    the identity."""
    from controlanimate_tpu.ops.color_match import match_colors_u8

    rs = np.random.RandomState(3)
    frames = rs.randint(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    # self-match: hm(identity) -> mkl(identity) -> hm(identity)
    out_self = np.asarray(match_colors_u8(jnp.asarray(frames[:1]), jnp.asarray(frames[0])))
    np.testing.assert_array_equal(out_self[0], frames[0])
    # general case: output distribution approaches the reference's
    ref = rs.randint(100, 200, (16, 16, 3)).astype(np.uint8)
    out = np.asarray(match_colors_u8(jnp.asarray(frames), jnp.asarray(ref)))
    assert out.shape == frames.shape and out.dtype == np.uint8
    for c in range(3):
        got_mean = out[0, :, :, c].mean()
        ref_mean = ref[:, :, c].mean()
        assert abs(got_mean - ref_mean) < 6.0, (c, got_mean, ref_mean)


def test_rgb_yuv420_roundtrip():
    """Device RGB->YUV420 must invert (via the host reference) to within
    chroma-subsampling error on smooth content."""
    from controlanimate_tpu.ops.yuv import rgb_to_yuv420, yuv420_to_rgb_host

    H = W = 16
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    smooth = np.stack([yy * 8, xx * 8, (yy + xx) * 4], axis=-1).clip(0, 255).astype(np.uint8)
    frames = np.stack([smooth, 255 - smooth])
    buf = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    assert buf.shape == (2, H * W * 3 // 2) and buf.dtype == np.uint8
    back = yuv420_to_rgb_host(buf, H, W)
    err = np.abs(back.astype(np.int32) - frames.astype(np.int32))
    assert err.mean() < 6.0 and err.max() < 48, (err.mean(), err.max())


def test_blend_overlap_weights():
    """alpha_i = (K-i-0.5)/K (reference: vid2vid.py:225-227)."""
    K = 4
    new = jnp.ones((K, 2, 2, 3))
    prev = jnp.zeros((K, 2, 2, 3))
    out = blend_overlap(new, prev)
    for i in range(K):
        alpha = (K - i - 0.5) / K
        np.testing.assert_allclose(float(out[i, 0, 0, 0]), 1 - alpha, rtol=1e-5)


def test_prompt_parser():
    from controlanimate_tpu.pipelines.prompt_weighting import parse_weighted_prompt

    frags = parse_weighted_prompt("a (red car)+ driving, fast++ (muscle body)0.2")
    d = {f.text: f.weight for f in frags}
    assert abs(d["red car"] - 1.1) < 1e-6
    assert abs(d["fast"] - 1.1**2) < 1e-6
    assert abs(d["muscle body"] - 0.2) < 1e-6
    assert "a" in d and abs(d["a"] - 1.0) < 1e-6
    # negatives
    frags = parse_weighted_prompt("(blurry)--, easynegative+")
    d = {f.text: f.weight for f in frags}
    assert abs(d["blurry"] - 1.1**-2) < 1e-6
    assert abs(d["easynegative"] - 1.1) < 1e-6


def test_weighted_encoding_changes_embeds():
    from controlanimate_tpu.models.tokenizer import CLIPTokenizer
    from controlanimate_tpu.pipelines.prompt_weighting import encode_weighted_prompt

    tok = CLIPTokenizer.tiny()
    D = 8

    def encode_fn(ids):
        # deterministic fake encoder: embedding = f(ids)
        return jnp.asarray(
            np.stack([np.outer(np.asarray(ids[0]) % 7, np.arange(1, D + 1))], 0),
            jnp.float32,
        )

    e_plain = encode_weighted_prompt(tok, encode_fn, "hello world")
    e_weighted = encode_weighted_prompt(tok, encode_fn, "hello (world)++")
    assert e_plain.shape == (1, 77, D)
    assert not np.allclose(np.asarray(e_plain), np.asarray(e_weighted))


def test_lora_fuse_kohya_and_peft():
    from controlanimate_tpu.weights.lora import fuse_lora

    rs = np.random.RandomState(0)
    W = rs.randn(8, 6).astype(np.float32)
    sd = {"down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight": W}
    up, down = rs.randn(8, 2).astype(np.float32), rs.randn(2, 6).astype(np.float32)

    kohya = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.alpha": np.asarray(2.0),
    }
    fused, n = fuse_lora(sd, kohya, scale=0.5)
    assert n == 1
    np.testing.assert_allclose(
        fused["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"],
        W + 0.5 * (2.0 / 2) * up @ down,
        rtol=1e-5,
    )

    peft = {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight": down,
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight": up,
    }
    fused2, n2 = fuse_lora(sd, peft, scale=1.0)
    assert n2 == 1
    np.testing.assert_allclose(
        fused2["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"],
        W + up @ down,  # alpha defaults to rank -> factor 1
        rtol=1e-5,
    )


def test_motion_lora_processor_format():
    from controlanimate_tpu.weights.lora import fuse_lora

    rs = np.random.RandomState(1)
    key = "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.attention_blocks.0.to_q.weight"
    W = rs.randn(8, 8).astype(np.float32)
    up, down = rs.randn(8, 4).astype(np.float32), rs.randn(4, 8).astype(np.float32)
    lora = {
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.attention_blocks.0.processor.to_q_lora.up.weight": up,
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.attention_blocks.0.processor.to_q_lora.down.weight": down,
    }
    fused, n = fuse_lora({key: W}, lora)
    assert n == 1
    np.testing.assert_allclose(fused[key], W + up @ down, rtol=1e-5)


def test_ldm_unet_key_conversion():
    from controlanimate_tpu.weights.ldm_conversion import convert_ldm_unet

    sd = {
        "model.diffusion_model.time_embed.0.weight": np.zeros((4, 4)),
        "model.diffusion_model.input_blocks.0.0.weight": np.zeros((4, 4, 3, 3)),
        "model.diffusion_model.input_blocks.1.0.in_layers.2.weight": np.zeros((4, 4, 3, 3)),
        "model.diffusion_model.input_blocks.1.1.proj_in.weight": np.zeros((4, 4, 1, 1)),
        "model.diffusion_model.input_blocks.3.0.op.weight": np.zeros((4, 4, 3, 3)),
        "model.diffusion_model.middle_block.1.norm.weight": np.zeros((4,)),
        "model.diffusion_model.output_blocks.2.2.conv.weight": np.zeros((4, 4, 3, 3)),
        "model.diffusion_model.output_blocks.3.0.skip_connection.weight": np.zeros((4, 4, 1, 1)),
        "model.diffusion_model.out.0.weight": np.zeros((4,)),
    }
    out = convert_ldm_unet(sd)
    assert "time_embedding.linear_1.weight" in out
    assert "conv_in.weight" in out
    assert "down_blocks.0.resnets.0.conv1.weight" in out
    assert "down_blocks.0.attentions.0.proj_in.weight" in out
    assert "down_blocks.0.downsamplers.0.conv.weight" in out
    assert "mid_block.attentions.0.norm.weight" in out
    assert "up_blocks.0.upsamplers.0.conv.weight" in out
    assert "up_blocks.1.resnets.0.conv_shortcut.weight" in out
    assert "conv_norm_out.weight" in out


def test_ldm_vae_key_conversion():
    from controlanimate_tpu.weights.ldm_conversion import convert_ldm_vae

    sd = {
        "first_stage_model.encoder.down.0.block.0.nin_shortcut.weight": np.zeros((4, 4, 1, 1)),
        "first_stage_model.encoder.down.1.downsample.conv.weight": np.zeros((4, 4, 3, 3)),
        "first_stage_model.decoder.up.0.block.1.conv1.weight": np.zeros((4, 4, 3, 3)),
        "first_stage_model.decoder.up.3.upsample.conv.weight": np.zeros((4, 4, 3, 3)),
        "first_stage_model.encoder.mid.attn_1.q.weight": np.zeros((4, 4, 1, 1)),
        "first_stage_model.quant_conv.weight": np.zeros((8, 8, 1, 1)),
    }
    out = convert_ldm_vae(sd)
    assert "encoder.down_blocks.0.resnets.0.conv_shortcut.weight" in out
    assert "encoder.down_blocks.1.downsamplers.0.conv.weight" in out
    # LDM decoder level 0 is the LOWEST resolution -> diffusers up_blocks.3
    assert "decoder.up_blocks.3.resnets.1.conv1.weight" in out
    assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in out
    assert out["encoder.mid_block.attentions.0.to_q.weight"].shape == (4, 4)


def test_real_easynegative_ti_loads():
    """The reference ships the actual easynegative embedding — load it."""
    path = Path("/root/reference/models/TI/easynegative.safetensors")
    if not path.exists():
        pytest.skip("TI file absent")
    from controlanimate_tpu.models.tokenizer import CLIPTokenizer
    from controlanimate_tpu.weights.textual_inversion import register_textual_inversions

    tok = CLIPTokenizer.tiny()
    mat = register_textual_inversions(tok, [str(path)])
    assert mat is not None and mat.ndim == 2 and mat.shape[1] == 768
    ids = tok.tokenize_to_ids("easynegative")
    assert len(ids) == mat.shape[0]
    assert all(i >= len(tok.vocab) for i in ids)


def test_prompt_conjunction_blend_and_and():
    """Compel conjunction operators: ("a","b").blend(w...) is the normalized
    weighted sum of the per-prompt encodings; .and() concatenates them on
    the token axis (capability beyond the reference's shipped configs)."""
    from controlanimate_tpu.models.tokenizer import CLIPTokenizer
    from controlanimate_tpu.pipelines.prompt_weighting import (
        encode_weighted_prompt,
        parse_conjunction,
    )

    tok = CLIPTokenizer.tiny()
    D = 8

    def encode_fn(ids):
        return jnp.asarray(
            np.stack([np.outer(np.asarray(ids[0]) % 7, np.arange(1, D + 1))], 0),
            jnp.float32,
        )

    assert parse_conjunction("plain (weighted)+ prompt") is None
    op, parts, args = parse_conjunction('("a cat", "a dog").blend(0.6, 0.4)')
    assert op == "blend" and parts == ["a cat", "a dog"] and args == [0.6, 0.4]

    e_cat = encode_weighted_prompt(tok, encode_fn, "a cat")
    e_dog = encode_weighted_prompt(tok, encode_fn, "a dog")
    blend = encode_weighted_prompt(tok, encode_fn, '("a cat", "a dog").blend(0.6, 0.4)')
    np.testing.assert_allclose(
        np.asarray(blend), 0.6 * np.asarray(e_cat) + 0.4 * np.asarray(e_dog),
        atol=1e-6,
    )

    both = encode_weighted_prompt(tok, encode_fn, '("a cat", "a dog").and()')
    assert both.shape == (1, 154, D)
    np.testing.assert_allclose(np.asarray(both[:, :77]), np.asarray(e_cat), atol=1e-6)
    np.testing.assert_allclose(np.asarray(both[:, 77:]), np.asarray(e_dog), atol=1e-6)

    # sub-prompts keep attention weighting
    wboth = encode_weighted_prompt(
        tok, encode_fn, '("a (cat)++", "a dog").and(0.5, 1.0)'
    )
    assert not np.allclose(np.asarray(wboth[:, :77]), np.asarray(e_cat))
    np.testing.assert_allclose(np.asarray(wboth[:, 77:]), np.asarray(e_dog), atol=1e-6)


def test_facade_pads_conjunction_cfg_pair():
    """A `.and()` positive with a plain negative must produce equal-length
    CFG embeds (the facade pads by repeating the final token embedding)."""
    import jax

    from controlanimate_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from controlanimate_tpu.models.tokenizer import CLIPTokenizer
    from controlanimate_tpu.pipelines.facade import TextStack

    tok = CLIPTokenizer.tiny()
    tcfg = CLIPTextConfig(
        vocab_size=len(tok.vocab), hidden_size=8, num_layers=1, num_heads=2,
        intermediate_size=16, eos_token_id=tok.eos_token_id,
    )
    model = CLIPTextModel(tcfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))["params"]
    ts = TextStack(tok, model, params)

    class FakeFacade:
        text = ts
        _prompt_cache = {}
        _encode_prompts = None

    from controlanimate_tpu.pipelines.facade import ControlAnimatePipeline

    pos, neg = ControlAnimatePipeline._encode_prompts(
        FakeFacade, '("a cat", "a dog").and()', "blurry"
    )
    assert pos.shape[1] == neg.shape[1] == 154
    # the pad region repeats the final token embedding
    np.testing.assert_allclose(
        np.asarray(neg[:, 77:]), np.asarray(jnp.repeat(neg[:, 76:77], 77, axis=1)),
        atol=1e-6,
    )


def test_ldm_controlnet_key_conversion():
    """Single-file ControlNet (LDM layout) -> diffusers ControlNetModel keys
    (reference: convert_from_ckpt.py:943,514-554). The LDM side is built by
    an INDEPENDENT inverse rename of every key controlnet_mapping() expects
    at SD1.5 geometry, so the converter's output must cover the mapping's
    key set exactly and pass values through untouched."""
    import re

    from controlanimate_tpu.models.unet3d import UNet3DConfig
    from controlanimate_tpu.weights.controlnet_weights import controlnet_mapping
    from controlanimate_tpu.weights.ldm_conversion import convert_ldm_controlnet

    inv_res = [("norm1.", "in_layers.0."), ("conv1.", "in_layers.2."),
               ("time_emb_proj.", "emb_layers.1."), ("norm2.", "out_layers.0."),
               ("conv2.", "out_layers.3."), ("conv_shortcut.", "skip_connection.")]

    def to_ldm(dk: str) -> str:
        if dk.startswith("time_embedding.linear_1."):
            return "time_embed.0." + dk.rsplit(".", 1)[1]
        if dk.startswith("time_embedding.linear_2."):
            return "time_embed.2." + dk.rsplit(".", 1)[1]
        if dk.startswith("conv_in."):
            return "input_blocks.0.0." + dk[len("conv_in."):]
        if dk.startswith("controlnet_cond_embedding.conv_in."):
            return "input_hint_block.0." + dk.rsplit(".", 1)[1]
        if dk.startswith("controlnet_cond_embedding.conv_out."):
            return "input_hint_block.14." + dk.rsplit(".", 1)[1]
        m = re.match(r"controlnet_cond_embedding\.blocks\.(\d+)\.(.*)", dk)
        if m:
            return f"input_hint_block.{2 * int(m.group(1)) + 2}.{m.group(2)}"
        m = re.match(r"controlnet_down_blocks\.(\d+)\.(.*)", dk)
        if m:
            return f"zero_convs.{m.group(1)}.0.{m.group(2)}"
        if dk.startswith("controlnet_mid_block."):
            return "middle_block_out.0." + dk.rsplit(".", 1)[1]
        m = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", dk)
        if m:
            lvl, pos, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            for new, old in inv_res:
                if rest.startswith(new):
                    rest = old + rest[len(new):]
                    break
            return f"input_blocks.{1 + 3 * lvl + pos}.0.{rest}"
        m = re.match(r"down_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", dk)
        if m:
            return f"input_blocks.{1 + 3 * int(m.group(1)) + int(m.group(2))}.1.{m.group(3)}"
        m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", dk)
        if m:
            return f"input_blocks.{3 + 3 * int(m.group(1))}.0.op.{m.group(2)}"
        m = re.match(r"mid_block\.resnets\.(\d+)\.(.*)", dk)
        if m:
            rest = m.group(2)
            for new, old in inv_res:
                if rest.startswith(new):
                    rest = old + rest[len(new):]
                    break
            return f"middle_block.{2 * int(m.group(1))}.{rest}"
        m = re.match(r"mid_block\.attentions\.0\.(.*)", dk)
        if m:
            return f"middle_block.1.{m.group(1)}"
        raise AssertionError(f"no inverse for {dk}")

    tkeys = [t for t, _, _ in controlnet_mapping(UNet3DConfig())]
    rs = np.random.RandomState(0)
    ldm_sd = {}
    expect = {}
    for t in tkeys:
        v = rs.randn(2).astype(np.float32)
        ldm_sd["control_model." + to_ldm(t)] = v
        expect[t] = v
    out = convert_ldm_controlnet(ldm_sd)
    assert set(out) == set(expect), (
        f"missing: {sorted(set(expect) - set(out))[:8]} "
        f"extra: {sorted(set(out) - set(expect))[:8]}")
    for t, v in expect.items():
        assert out[t] is v  # pure rename, no value transform

    # bare (unprefixed) checkpoints convert identically
    bare = {k[len("control_model."):]: v for k, v in ldm_sd.items()}
    assert set(convert_ldm_controlnet(bare)) == set(expect)


def test_open_clip_key_conversion():
    """SD2.x open-clip text tower -> HF CLIPTextModel keys (reference:
    convert_from_ckpt.py:822): in_proj q/k/v split, resblock renames, final
    layer (resblocks.23) dropped, text_projection/logit_scale dropped."""
    from controlanimate_tpu.weights.ldm_conversion import (
        convert_ldm_clip,
        convert_open_clip,
    )

    rs = np.random.RandomState(1)
    D = 8
    sd = {
        "cond_stage_model.model.positional_embedding": rs.randn(77, D).astype(np.float32),
        "cond_stage_model.model.token_embedding.weight": rs.randn(49408, D).astype(np.float32),
        "cond_stage_model.model.ln_final.weight": rs.randn(D).astype(np.float32),
        "cond_stage_model.model.ln_final.bias": rs.randn(D).astype(np.float32),
        "cond_stage_model.model.text_projection": rs.randn(D, D).astype(np.float32),
        "cond_stage_model.model.logit_scale": np.asarray(1.0, np.float32),
    }
    for i in (0, 1, 23):  # layer 23 must be dropped
        p = f"cond_stage_model.model.transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = rs.randn(D).astype(np.float32)
        sd[f"{p}.ln_2.bias"] = rs.randn(D).astype(np.float32)
        sd[f"{p}.attn.in_proj_weight"] = rs.randn(3 * D, D).astype(np.float32)
        sd[f"{p}.attn.in_proj_bias"] = rs.randn(3 * D).astype(np.float32)
        sd[f"{p}.attn.out_proj.weight"] = rs.randn(D, D).astype(np.float32)
        sd[f"{p}.mlp.c_fc.weight"] = rs.randn(4 * D, D).astype(np.float32)
        sd[f"{p}.mlp.c_proj.weight"] = rs.randn(D, 4 * D).astype(np.float32)

    out = convert_open_clip(sd)
    assert "text_model.embeddings.position_embedding.weight" in out
    assert "text_model.embeddings.token_embedding.weight" in out
    assert "text_model.final_layer_norm.weight" in out
    assert "text_model.encoder.layers.0.layer_norm1.weight" in out
    assert "text_model.encoder.layers.1.layer_norm2.bias" in out
    assert "text_model.encoder.layers.0.self_attn.out_proj.weight" in out
    assert "text_model.encoder.layers.0.mlp.fc1.weight" in out
    assert "text_model.encoder.layers.0.mlp.fc2.weight" in out
    # q/k/v split slices the fused in_proj at d_model = text_projection rows
    ipw = sd["cond_stage_model.model.transformer.resblocks.0.attn.in_proj_weight"]
    np.testing.assert_array_equal(
        out["text_model.encoder.layers.0.self_attn.q_proj.weight"], ipw[:D])
    np.testing.assert_array_equal(
        out["text_model.encoder.layers.0.self_attn.k_proj.weight"], ipw[D:2 * D])
    np.testing.assert_array_equal(
        out["text_model.encoder.layers.0.self_attn.v_proj.weight"], ipw[2 * D:])
    # dropped: final layer, projection head, logit scale
    assert not any("layers.23" in k for k in out)
    assert not any("text_projection" in k or "logit_scale" in k for k in out)

    # convert_ldm_clip dispatches open-clip checkpoints automatically
    via_dispatch = convert_ldm_clip(sd)
    assert set(via_dispatch) == set(out)
