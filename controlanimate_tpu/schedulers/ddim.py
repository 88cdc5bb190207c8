"""DDIM sampler (deterministic, eta=0) — functional, table-driven.

Capability parity with the reference's DDIMScheduler registry entry
(reference: modules/controlanimate_pipeline.py:54,65).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Scheduler, register
from .common import DiffusionSchedule, leading_timesteps, truncate_for_strength


@register("DDIMScheduler")
class DDIMScheduler(Scheduler):
    def __init__(
        self,
        schedule: DiffusionSchedule,
        num_inference_steps: int,
        strength: float = 1.0,
        steps_offset: int = 1,
        # diffusers DDIMScheduler defaults set_alpha_to_one=True and the
        # reference passes only beta kwargs (modules/controlanimate_pipeline.py:65,
        # configs/inference/inference-v2.yaml), so the final step uses alpha=1
        set_alpha_to_one: bool = True,
        clip_sample: bool = False,
        prediction_type: str = "epsilon",
        eta: float = 0.0,
    ):
        super().__init__(schedule)
        T = schedule.num_train_timesteps
        ts = leading_timesteps(T, num_inference_steps, steps_offset)
        ts = truncate_for_strength(ts, num_inference_steps, strength)
        self.timesteps = ts
        self.num_steps = len(ts)
        self.init_noise_sigma = 1.0
        self.prediction_type = prediction_type
        self.clip_sample = clip_sample
        self.eta = float(eta)

        step_ratio = T // num_inference_steps
        abar = schedule.alphas_cumprod
        final_alpha = 1.0 if set_alpha_to_one else abar[0]
        prev_ts = ts - step_ratio
        abar_t = abar[ts]
        abar_prev = np.where(prev_ts >= 0, abar[np.clip(prev_ts, 0, None)], final_alpha)
        self._abar_t = jnp.asarray(abar_t, jnp.float32)
        self._abar_prev = jnp.asarray(abar_prev, jnp.float32)
        # eta-variance per step: sigma^2 = eta^2 * (1-a_prev)/(1-a_t) * (1 - a_t/a_prev)
        var = (1 - abar_prev) / (1 - abar_t) * (1 - abar_t / abar_prev)
        self._sigma = jnp.asarray(self.eta * np.sqrt(np.maximum(var, 0.0)), jnp.float32)

    def step(self, i, model_output, sample, state, key):
        a_t = self._abar_t[i]
        a_prev = self._abar_prev[i]
        x0 = self.pred_original(model_output, sample, a_t, self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        # direction term re-derives epsilon from (possibly clipped) x0
        eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
        sigma = self._sigma[i]
        dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * eps
        prev = jnp.sqrt(a_prev) * x0 + dir_xt
        if self.eta > 0.0:
            from .base import batch_shared_normal

            noise = batch_shared_normal(key, sample.shape, sample.dtype)
            prev = prev + sigma * noise
        return prev, state
