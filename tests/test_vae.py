"""VAE structural + mapping tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from controlanimate_tpu.models.vae import AutoencoderKL
from controlanimate_tpu.weights.vae_weights import normalize_vae_keys, vae_mapping

TINY_CH = (8, 16, 16, 16)


def make():
    vae = AutoencoderKL(block_out_channels=TINY_CH, groups=4)
    x = jnp.zeros((1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    return vae, params


def test_shapes_and_roundtrip():
    vae, params = make()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 0.5
    z = vae.apply({"params": params}, x, method=AutoencoderKL.encode)
    assert z.shape == (2, 4, 4, 4)  # H/8, W/8, latent 4
    y = vae.apply({"params": params}, z, method=AutoencoderKL.decode)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_posterior_sampling_keyed():
    vae, params = make()
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    z1 = vae.apply({"params": params}, x, jax.random.PRNGKey(1), method=AutoencoderKL.encode)
    z2 = vae.apply({"params": params}, x, jax.random.PRNGKey(2), method=AutoencoderKL.encode)
    z_mode = vae.apply({"params": params}, x, method=AutoencoderKL.encode)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))
    assert not np.allclose(np.asarray(z1), np.asarray(z_mode))


def test_mapping_covers_every_param():
    _, params = make()

    def leaf_paths(tree, prefix=""):
        out = []
        for k in sorted(tree):
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(tree[k], dict):
                out.extend(leaf_paths(tree[k], p))
            else:
                out.append(p)
        return out

    mapped = {f for _, f, _ in vae_mapping(TINY_CH)}
    leaves = set(leaf_paths(params))
    assert not (leaves - mapped), f"unmapped: {sorted(leaves - mapped)[:8]}"
    assert not (mapped - leaves), f"phantom: {sorted(mapped - leaves)[:8]}"


def test_legacy_attention_key_normalization():
    sd = {
        "encoder.mid_block.attentions.0.query.weight": np.zeros((8, 8, 1, 1)),
        "encoder.mid_block.attentions.0.proj_attn.bias": np.zeros((8,)),
    }
    out = normalize_vae_keys(sd)
    assert "encoder.mid_block.attentions.0.to_q.weight" in out
    assert out["encoder.mid_block.attentions.0.to_q.weight"].shape == (8, 8)
    assert "encoder.mid_block.attentions.0.to_out.0.bias" in out


def test_vae_golden_vs_torch_oracle():
    """Golden numerics vs an independent torch AutoencoderKL mirror
    (VERDICT r2 #1; tests/torch_mirrors.py), weights via vae_weights.py."""
    import torch

    from controlanimate_tpu.weights.vae_weights import vae_params_from_torch
    from torch_mirrors import TorchVAE, randomize_

    ch = (8, 16, 16, 16)
    oracle = TorchVAE(ch, latent_channels=4, groups=4)
    randomize_(oracle, seed=5)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = vae_params_from_torch(sd, ch)
    vae = AutoencoderKL(block_out_channels=ch, groups=4)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    mean_j, logvar_j = vae.apply(
        {"params": params}, jnp.asarray(x), method=AutoencoderKL.encode_moments
    )
    with torch.no_grad():
        mean_t, logvar_t = oracle.encode_moments(torch.tensor(x).permute(0, 3, 1, 2))
    mean_t = mean_t.permute(0, 2, 3, 1).numpy()
    logvar_t = np.clip(logvar_t.permute(0, 2, 3, 1).numpy(), -30.0, 20.0)
    assert np.abs(np.asarray(mean_j) - mean_t).max() < 1e-4, "encoder mean diverges"
    assert np.abs(np.asarray(logvar_j) - logvar_t).max() < 1e-4, "encoder logvar diverges"

    z = rng.randn(1, 8, 8, 4).astype(np.float32)
    dec_j = vae.apply(
        {"params": params}, jnp.asarray(z) * vae.scaling_factor, method=AutoencoderKL.decode
    )
    with torch.no_grad():
        dec_t = oracle.decode(torch.tensor(z).permute(0, 3, 1, 2))
    dec_t = dec_t.permute(0, 2, 3, 1).numpy()
    assert np.abs(np.asarray(dec_j) - dec_t).max() < 1e-4, "decoder diverges"
