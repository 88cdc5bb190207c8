"""DDIM inversion + save_videos_grid (reference utils/util.py:28-99)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.schedulers import make_schedule, make_scheduler
from controlanimate_tpu.utils.inversion import ddim_inversion
from controlanimate_tpu.utils.video import make_grid, save_videos_grid

SCHED = make_schedule()


def test_ddim_inversion_roundtrips_the_sampler():
    """With a state-independent epsilon oracle, each inversion step
    (t-ratio -> t) is the exact algebraic inverse of the eta=0 DDIM sampler
    step at t — sampling down from the inverted latent must retrace the
    whole trajectory back to the input."""
    steps = 10
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 2, 4, 4, 4), jnp.float32)
    e0 = jnp.asarray(rng.randn(1, 2, 4, 4, 4), jnp.float32)
    ctx = jnp.zeros((1, 1, 1))

    def eps_fn(lat, t, context):
        return e0 * (t.astype(jnp.float32) / 1000.0 + 0.3)

    trail = ddim_inversion(eps_fn, SCHED, x0, steps, ctx)
    assert trail.shape == (steps + 1, *x0.shape)
    np.testing.assert_array_equal(np.asarray(trail[0]), np.asarray(x0))

    sched = make_scheduler("DDIMScheduler", SCHED, steps)
    sample = trail[-1]
    state = sched.init_state(sample.shape)
    key = jax.random.PRNGKey(0)
    for i in range(steps):
        t = jnp.asarray(sched.timesteps[i])
        sample, state = sched.step(i, eps_fn(sample, t, ctx), sample, state, key)
        # sampler at step i lands on the inversion trail entry steps-1-i
        np.testing.assert_allclose(
            np.asarray(sample), np.asarray(trail[steps - 1 - i]),
            atol=2e-4, rtol=1e-4,
        )
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=2e-4)


def test_ddim_inversion_is_jittable():
    e0 = jnp.ones((1, 1, 2, 2, 4), jnp.float32)

    def eps_fn(lat, t, context):
        return 0.1 * e0

    f = jax.jit(lambda lat: ddim_inversion(eps_fn, SCHED, lat, 5, jnp.zeros((1,))))
    out = f(jnp.zeros((1, 1, 2, 2, 4)))
    assert out.shape == (6, 1, 1, 2, 2, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_make_grid_layout():
    b, h, w = 5, 3, 4
    imgs = np.arange(b * h * w * 3, dtype=np.float32).reshape(b, h, w, 3) / 200.0
    grid = make_grid(imgs, n_rows=2, padding=2)
    # 3 rows x 2 cols of cells, 2px padding everywhere (torchvision layout)
    assert grid.shape == (3 * (h + 2) + 2, 2 * (w + 2) + 2, 3)
    np.testing.assert_array_equal(grid[2:2 + h, 2:2 + w], imgs[0])       # cell (0,0)
    np.testing.assert_array_equal(grid[2:2 + h, 4 + w:4 + 2 * w], imgs[1])  # cell (0,1)
    np.testing.assert_array_equal(grid[4 + h:4 + 2 * h, 2:2 + w], imgs[2])  # cell (1,0)
    assert np.all(grid[0] == 0) and np.all(grid[:, 0] == 0)  # border


def test_save_videos_grid_writes_gif(tmp_path):
    rng = np.random.RandomState(1)
    videos = rng.rand(3, 4, 8, 8, 3).astype(np.float32)
    path = tmp_path / "nested" / "grid.gif"
    save_videos_grid(videos, str(path), n_rows=2, fps=4)
    assert path.exists() and path.stat().st_size > 0

    import imageio

    frames = imageio.mimread(str(path))
    assert len(frames) == 4
    # 2 rows x 2 cols grid of 8x8 cells with 2px padding
    assert frames[0].shape[0] == 2 * 10 + 2 and frames[0].shape[1] == 2 * 10 + 2


def test_save_videos_grid_rescale_and_uint8(tmp_path):
    u8 = (np.random.RandomState(2).rand(1, 2, 6, 6, 3) * 255).astype(np.uint8)
    save_videos_grid(u8, str(tmp_path / "u8.gif"))
    signed = np.random.RandomState(3).rand(1, 2, 6, 6, 3).astype(np.float32) * 2 - 1
    save_videos_grid(signed, str(tmp_path / "signed.gif"), rescale=True)
    with pytest.raises(ValueError, match="expected"):
        save_videos_grid(np.zeros((2, 6, 6, 3)), str(tmp_path / "bad.gif"))
