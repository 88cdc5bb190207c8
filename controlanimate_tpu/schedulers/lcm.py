"""Latent Consistency Model (LCM) sampler — functional re-design of the
scheduler the reference vendors inline
(reference: animatediff/pipelines/controlanimation_pipeline.py:977-1317).

Behavioral contract reproduced:
  - timestep selection as a strided subsequence of the
    `lcm_origin_steps * strength` training steps
    (reference: :1143-1170);
  - consistency boundary conditions c_skip/c_out with sigma_data=0.5 and
    timestep scaling x10 (reference: :1172-1178);
  - `step` computes pred_x0, `denoised = c_out*x0 + c_skip*sample`, and
    re-noises to the next timestep for multi-step sampling
    (reference: :1240-1264) — except that where the reference draws
    **unseeded** torch noise mid-step (:1261), this implementation threads an
    explicit jax.random key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import Scheduler, batch_shared_normal, register
from .common import DiffusionSchedule


@register("LCMScheduler")
class LCMScheduler(Scheduler):
    is_lcm = True

    def __init__(
        self,
        schedule: DiffusionSchedule,
        num_inference_steps: int,
        strength: float = 1.0,
        lcm_origin_steps: int = 50,
        prediction_type: str = "epsilon",
        sigma_data: float = 0.5,
        timestep_scaling: float = 10.0,
        strength_mode: str = "origin",
    ):
        """strength_mode:
        'origin' — strength scales the origin-step count before striding
          (the vendored scheduler's img2img behavior, used on the use_lcm
          path; reference :1162-1170);
        'tail'   — full table, then img2img tail truncation (the diffusers
          LCMScheduler + get_timesteps path taken when the registry
          scheduler is LCM but use_lcm=0, i.e. LCM-LoRA profiles;
          reference :731-740)."""
        super().__init__(schedule)
        T = schedule.num_train_timesteps
        S = num_inference_steps
        c = T // lcm_origin_steps
        origin_strength = strength if strength_mode == "origin" else 1.0
        origin = np.arange(1, int(lcm_origin_steps * origin_strength) + 1) * c - 1
        skipping = max(len(origin) // S, 1)
        ts = origin[::-skipping][:S].astype(np.int64).copy()  # descending, strided
        if strength_mode == "tail" and strength < 1.0:
            from .common import truncate_for_strength

            ts = truncate_for_strength(ts, S, strength)
        self.timesteps = ts
        self.num_steps = len(ts)
        self.init_noise_sigma = 1.0
        self.prediction_type = prediction_type

        abar = schedule.alphas_cumprod
        a_t = abar[ts]
        # next (lower) timestep for multistep re-noising; last step emits denoised
        ts_next = np.concatenate([ts[1:], [0]])
        a_next = abar[ts_next]

        scaled_t = ts.astype(np.float64) * timestep_scaling
        c_skip = sigma_data**2 / (scaled_t**2 + sigma_data**2)
        c_out = scaled_t / np.sqrt(scaled_t**2 + sigma_data**2)

        self._abar_t = jnp.asarray(a_t, jnp.float32)
        self._abar_next = jnp.asarray(a_next, jnp.float32)
        self._c_skip = jnp.asarray(c_skip, jnp.float32)
        self._c_out = jnp.asarray(c_out, jnp.float32)

    def step(self, i, model_output, sample, state, key):
        a_t = self._abar_t[i]
        x0 = self.pred_original(model_output, sample, a_t, self.prediction_type)
        denoised = self._c_out[i] * x0 + self._c_skip[i] * sample
        noise = batch_shared_normal(key, sample.shape, sample.dtype)
        a_n = self._abar_next[i]
        renoised = jnp.sqrt(a_n) * denoised + jnp.sqrt(1.0 - a_n) * noise
        is_last = i == (self.num_steps - 1)
        prev = jnp.where(is_last, denoised, renoised)
        return prev, state
