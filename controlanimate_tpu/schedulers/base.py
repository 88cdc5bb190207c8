"""Scheduler protocol + registry.

The reference builds torch schedulers from a name registry
(reference: modules/controlanimate_pipeline.py:52-73). Here each scheduler is
an immutable object created per (schedule, num_steps, strength); its `step`
is **index-based** and pure so the whole denoise loop can be a single
`lax.scan` — mirroring how the reference's vendored LCM step already takes an
index (reference: controlanimation_pipeline.py:833).

Stateful history (LMS derivatives, PNDM ets, DPM model outputs) lives in an
explicit `state` pytree threaded through the scan carry.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from .common import DiffusionSchedule


def batch_shared_normal(key, shape, dtype=jnp.float32):
    """Gaussian noise SHARED across the leading batch axis.

    The engine's batch axis carries independent same-seed videos (lockstep
    segments in segment-parallel vid2vid, or data-parallel windows on a
    mesh). The reference, run separately on each segment with the same
    config seed, draws the SAME noise stream for every segment
    (reference: modules/controlanimate_pipeline.py:129-130 re-seeds per
    window) — so batch elements must share draws for per-segment parity
    with a sequential run. Identical to a plain draw when shape[0] == 1.
    """
    import jax

    one = jax.random.normal(key, (1, *shape[1:]), dtype)
    return jnp.broadcast_to(one, shape)


class Scheduler:
    """Base functional scheduler.

    Attributes set by subclasses at construction time:
      timesteps      — np.ndarray (S,) of (possibly fractional) train timesteps
      num_steps      — number of denoise iterations the scan must run
      init_noise_sigma — scalar multiplier for fresh txt2img noise
    """

    order: int = 1
    # True when the sampler consumes the CFG-free LCM path
    is_lcm: bool = False

    timesteps: np.ndarray
    num_steps: int
    init_noise_sigma: float

    def __init__(self, schedule: DiffusionSchedule):
        self.schedule = schedule
        self.alphas_cumprod = jnp.asarray(schedule.alphas_cumprod, dtype=jnp.float32)

    # -- interface -----------------------------------------------------------
    def init_state(self, shape, dtype=jnp.float32) -> Any:
        """History carry for the scan; default: none."""
        return ()

    def scale_model_input(self, i, sample):
        return sample

    def step(self, i, model_output, sample, state, key):
        """One denoise update. `i` is the inference-step index (may be traced).

        Returns (prev_sample, new_state).
        """
        raise NotImplementedError

    def add_noise_t(self, x0, noise, t):
        """Noise a clean latent to raw train timestep `t` (DDPM forward)."""
        abar = self.alphas_cumprod[jnp.asarray(t, jnp.int32)]
        while abar.ndim < x0.ndim:
            abar = abar[..., None]
        return jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * noise

    def add_noise(self, x0, noise, i):
        """Noise a clean latent to the level of inference step `i`.

        Sigma-space schedulers (Euler/LMS) override this — their latents are
        x0 + sigma*eps rather than the DDPM sqrt-abar mix.
        """
        t = jnp.asarray(np.round(self.timesteps).astype(np.int64))[jnp.asarray(i, jnp.int32)]
        return self.add_noise_t(x0, noise, t)

    # -- helpers -------------------------------------------------------------
    def pred_original(self, model_output, sample, abar_t, prediction_type: str = "epsilon"):
        """Recover x0 from the model output (epsilon / v / sample prediction),
        as the reference's vendored scheduler does
        (reference: controlanimation_pipeline.py:1240-1255)."""
        sqrt_ab = jnp.sqrt(abar_t)
        sqrt_1mab = jnp.sqrt(1.0 - abar_t)
        if prediction_type == "epsilon":
            return (sample - sqrt_1mab * model_output) / sqrt_ab
        if prediction_type == "v_prediction":
            return sqrt_ab * sample - sqrt_1mab * model_output
        if prediction_type == "sample":
            return model_output
        raise ValueError(f"unknown prediction_type {prediction_type!r}")


_REGISTRY: dict[str, Callable[..., Scheduler]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def make_scheduler(
    name: str,
    schedule: DiffusionSchedule,
    num_inference_steps: int,
    strength: float = 1.0,
    **kwargs,
) -> Scheduler:
    """Build a scheduler by its diffusers-style registry name
    (reference: configs/prompts/SampleConfig.yaml `scheduler:` key)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown scheduler {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](schedule, num_inference_steps, strength=strength, **kwargs)


def available_schedulers() -> list[str]:
    return sorted(_REGISTRY)
