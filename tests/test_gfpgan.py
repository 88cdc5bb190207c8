"""GFPGAN clean-arch structure + weight-mapping coverage (synthetic ckpt)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.models.gfpgan import (

    GFPGANv1Clean,
    _channels,
    gfpgan_params_from_torch,
)

pytestmark = pytest.mark.slow  # heavy torch golden build (use --runslow)

OUT_SIZE = 64  # tiny pyramid: log2=6 -> 4 down/up levels


def tiny_model():
    return GFPGANv1Clean(out_size=OUT_SIZE, num_style_feat=32, channel_multiplier=2)


def test_forward_shapes_random_init():
    m = tiny_model()
    x = jnp.zeros((1, OUT_SIZE, OUT_SIZE, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": params}, x)
    assert y.shape == (1, OUT_SIZE, OUT_SIZE, 3)
    assert bool(jnp.all(jnp.isfinite(y)))


def _synthetic_ckpt(params_flax):
    """Build a torch-layout state dict with shapes derived from the flax
    tree, to exercise the mapping end to end."""
    rs = np.random.RandomState(0)
    sd = {}

    def put_conv(t, kernel):
        kh, kw, i, o = kernel.shape
        sd[f"{t}.weight"] = rs.randn(o, i, kh, kw).astype(np.float32) * 0.02
        sd[f"{t}.bias"] = rs.randn(o).astype(np.float32) * 0.01

    def walk(tree, fpath=""):
        for k, v in tree.items():
            p = f"{fpath}/{k}" if fpath else k
            if isinstance(v, dict):
                walk(v, p)
    walk(params_flax)
    return sd


def test_weight_mapping_covers_tree():
    """Generate a synthetic torch ckpt from the inverse shapes and verify the
    mapping fills every leaf of the flax tree."""
    m = tiny_model()
    x = jnp.zeros((1, OUT_SIZE, OUT_SIZE, 3))
    ref = m.init(jax.random.PRNGKey(0), x)["params"]

    # build a torch sd by inverting each leaf's conversion
    rs = np.random.RandomState(1)
    sd = {}

    def leaf_items(tree, prefix=""):
        for k in sorted(tree):
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(tree[k], dict):
                yield from leaf_items(tree[k], p)
            else:
                yield p, tree[k]

    log_size = int(math.log2(OUT_SIZE))

    def t_from_f(fpath: str) -> str:
        t = fpath.replace("/", ".")
        t = t.replace("stylegan_decoder.", "stylegan_decoder@")
        for i in range(log_size - 2):
            t = t.replace(f"conv_body_down_{i}.", f"conv_body_down.{i}.")
            t = t.replace(f"conv_body_up_{i}.", f"conv_body_up.{i}.")
            t = t.replace(f"condition_scale_{i}_0", f"condition_scale.{i}.0")
            t = t.replace(f"condition_scale_{i}_2", f"condition_scale.{i}.2")
            t = t.replace(f"condition_shift_{i}_0", f"condition_shift.{i}.0")
            t = t.replace(f"condition_shift_{i}_2", f"condition_shift.{i}.2")
        for i in range(2 * (log_size - 2)):
            t = t.replace(f"style_convs_{i}.", f"style_convs.{i}.")
        for i in range(log_size - 2):
            t = t.replace(f"to_rgbs_{i}.", f"to_rgbs.{i}.")
        return t.replace("@", ".")

    for fpath, leaf in leaf_items(ref):
        arr = np.asarray(leaf)
        t = t_from_f(fpath)
        if t.endswith(".kernel"):
            base = t[: -len(".kernel")]
            if arr.ndim == 4:  # conv kernel (kh,kw,I,O) -> (O,I,kh,kw)
                sd[f"{base}.weight"] = rs.randn(*np.transpose(arr, (3, 2, 0, 1)).shape).astype(np.float32)
            else:  # dense (I,O) -> (O,I)
                sd[f"{base}.weight"] = rs.randn(arr.shape[1], arr.shape[0]).astype(np.float32)
        elif t.endswith(".bias"):
            sd[t] = rs.randn(*arr.shape).astype(np.float32)
        elif t.endswith("noise_weight"):
            sd[t.replace(".noise_weight", ".weight")] = np.asarray(rs.randn(), np.float32)
        elif t.endswith("constant_input"):
            sd["stylegan_decoder.constant_input.weight"] = rs.randn(
                1, arr.shape[-1], arr.shape[1], arr.shape[2]
            ).astype(np.float32)
        elif t.endswith(".weight") and arr.ndim == 4:  # modulated conv weight (O,C,k,k)
            sd[t] = rs.randn(1, *arr.shape).astype(np.float32)
        else:
            sd[t] = rs.randn(*arr.shape).astype(np.float32)

    params = gfpgan_params_from_torch(sd, out_size=OUT_SIZE)

    ref_paths = {p for p, _ in leaf_items(ref)}
    got_paths = {p for p, _ in leaf_items(params)}
    assert ref_paths == got_paths, (
        f"missing: {sorted(ref_paths - got_paths)[:6]} "
        f"extra: {sorted(got_paths - ref_paths)[:6]}"
    )
    # shapes line up and the model runs with loaded weights
    for (p1, a), (p2, b) in zip(sorted(leaf_items(ref)), sorted(leaf_items(params))):
        assert np.asarray(a).shape == np.asarray(b).shape, (p1, np.asarray(a).shape, np.asarray(b).shape)
    m = tiny_model()
    y = m.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                jnp.zeros((1, OUT_SIZE, OUT_SIZE, 3)))
    assert y.shape == (1, OUT_SIZE, OUT_SIZE, 3)


def test_sft_conditions_affect_output():
    m = tiny_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, OUT_SIZE, OUT_SIZE, 3)) * 0.5
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    y1 = m.apply({"params": params}, x)
    y2 = m.apply({"params": params}, x * -1.0)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
