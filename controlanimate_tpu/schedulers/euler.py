"""Euler and Euler-ancestral discrete samplers (sigma-space), table-driven.

Capability parity with the reference registry entries EulerDiscreteScheduler /
EulerAncestralDiscreteScheduler (reference:
modules/controlanimate_pipeline.py:56-57,67-68). The default SampleConfig
profile samples with Euler at 30 steps (reference:
configs/prompts/SampleConfig.yaml:105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import Scheduler, batch_shared_normal, register
from .common import (
    DiffusionSchedule,
    interp_sigmas,
    linspace_timesteps,
    truncate_for_strength,
)


class _SigmaScheduler(Scheduler):
    """Shared machinery for sigma-space schedulers (Euler family, LMS)."""

    def __init__(
        self,
        schedule: DiffusionSchedule,
        num_inference_steps: int,
        strength: float = 1.0,
    ):
        super().__init__(schedule)
        T = schedule.num_train_timesteps
        ts = linspace_timesteps(T, num_inference_steps)
        ts = truncate_for_strength(ts, num_inference_steps, strength)
        self.timesteps = ts
        self.num_steps = len(ts)
        sig = interp_sigmas(ts, schedule.alphas_cumprod)
        self._sigmas_np = np.concatenate([sig, [0.0]])
        self.sigmas = jnp.asarray(self._sigmas_np, jnp.float32)
        # linspace spacing -> init_noise_sigma is max sigma
        self.init_noise_sigma = float(sig.max()) if len(sig) else 1.0

    def scale_model_input(self, i, sample):
        sigma = self.sigmas[i]
        return sample / jnp.sqrt(sigma**2 + 1.0)

    def add_noise(self, x0, noise, i):
        # sigma-space forward process: x = x0 + sigma * eps
        return x0 + self.sigmas[jnp.asarray(i, jnp.int32)] * noise

    def _pred_x0(self, model_output, sample, sigma, prediction_type="epsilon"):
        if prediction_type == "epsilon":
            return sample - sigma * model_output
        if prediction_type == "v_prediction":
            return model_output * (-sigma / jnp.sqrt(sigma**2 + 1)) + sample / (sigma**2 + 1)
        if prediction_type == "sample":
            return model_output
        raise ValueError(prediction_type)


@register("EulerDiscreteScheduler")
class EulerDiscreteScheduler(_SigmaScheduler):
    def __init__(self, schedule, num_inference_steps, strength=1.0, prediction_type="epsilon"):
        super().__init__(schedule, num_inference_steps, strength)
        self.prediction_type = prediction_type

    def step(self, i, model_output, sample, state, key):
        sigma = self.sigmas[i]
        sigma_next = self.sigmas[i + 1]
        x0 = self._pred_x0(model_output, sample, sigma, self.prediction_type)
        derivative = (sample - x0) / sigma
        prev = sample + derivative * (sigma_next - sigma)
        return prev, state


@register("EulerAncestralDiscreteScheduler")
class EulerAncestralDiscreteScheduler(_SigmaScheduler):
    def __init__(self, schedule, num_inference_steps, strength=1.0, prediction_type="epsilon"):
        super().__init__(schedule, num_inference_steps, strength)
        self.prediction_type = prediction_type
        s = self._sigmas_np
        s_from, s_to = s[:-1], s[1:]
        with np.errstate(divide="ignore", invalid="ignore"):
            up2 = s_to**2 * (s_from**2 - s_to**2) / np.where(s_from == 0, 1.0, s_from**2)
        sigma_up = np.sqrt(np.maximum(up2, 0.0))
        sigma_down = np.sqrt(np.maximum(s_to**2 - sigma_up**2, 0.0))
        self._sigma_up = jnp.asarray(sigma_up, jnp.float32)
        self._sigma_down = jnp.asarray(sigma_down, jnp.float32)

    def step(self, i, model_output, sample, state, key):
        sigma = self.sigmas[i]
        x0 = self._pred_x0(model_output, sample, sigma, self.prediction_type)
        derivative = (sample - x0) / sigma
        prev = sample + derivative * (self._sigma_down[i] - sigma)
        noise = batch_shared_normal(key, sample.shape, sample.dtype)
        prev = prev + noise * self._sigma_up[i]
        return prev, state
