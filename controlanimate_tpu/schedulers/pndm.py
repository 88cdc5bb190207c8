"""PNDM (PLMS) sampler with skip_prk semantics — fully table-driven.

Capability parity with the reference's PNDMScheduler registry entry
(reference: modules/controlanimate_pipeline.py:59,72). The PLMS warmup
(duplicated second timestep, Heun-style counter==1 special case) is encoded
as per-iteration mode/coefficient tables so the whole S+1-iteration loop
remains a single lax.scan.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Scheduler, register
from .common import DiffusionSchedule, truncate_for_strength


@register("PNDMScheduler")
class PNDMScheduler(Scheduler):
    order = 4

    def __init__(
        self,
        schedule: DiffusionSchedule,
        num_inference_steps: int,
        strength: float = 1.0,
        steps_offset: int = 1,
        # diffusers PNDMScheduler defaults set_alpha_to_one=False (unlike
        # DDIM); the reference passes only beta kwargs, so keep False
        set_alpha_to_one: bool = False,
        prediction_type: str = "epsilon",
    ):
        super().__init__(schedule)
        if prediction_type != "epsilon":
            raise NotImplementedError("PNDM supports epsilon prediction")
        T = schedule.num_train_timesteps
        S = num_inference_steps
        step_ratio = T // S
        base = (np.arange(0, S) * step_ratio).round().astype(np.int64) + steps_offset  # ascending
        # PLMS sequence: duplicate the second-highest timestep (warmup Heun step)
        plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        # img2img truncation slices the ALREADY-BUILT PLMS sequence by
        # t_start (reference get_timesteps slices scheduler.timesteps,
        # controlanimation_pipeline.py:615-622) — at t_start>=2 this removes
        # the warmup duplicate entirely; the counter-based warmup semantics
        # (diffusers PNDMScheduler.step_plms counter==0/1 special cases)
        # still apply to the first two sliced positions.
        if strength < 1.0:
            plms = truncate_for_strength(plms, S, strength).copy()
        self.timesteps = plms
        n = len(plms)
        self.num_steps = n
        self.init_noise_sigma = 1.0

        abar = schedule.alphas_cumprod
        final_alpha = 1.0 if set_alpha_to_one else abar[0]

        # per-iteration effective (t, t_prev) pairs
        t_eff = plms.copy()
        t_prev = plms - step_ratio
        if n >= 2:
            # counter==1: evaluate transition (t1 + ratio) -> t1 from cur_sample
            t_eff[1] = plms[1] + step_ratio
            t_prev[1] = plms[1]
        a_t = abar[np.clip(t_eff, 0, T - 1)]
        a_prev = np.where(t_prev >= 0, abar[np.clip(t_prev, 0, None)], final_alpha)
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        sample_coeff = np.sqrt(a_prev / a_t)
        denom = a_t * np.sqrt(b_prev) + np.sqrt(a_t * b_t * a_prev)
        diff_coeff = (a_prev - a_t) / denom
        self._sample_coeff = jnp.asarray(sample_coeff, jnp.float32)
        self._diff_coeff = jnp.asarray(diff_coeff, jnp.float32)
        # mode per iteration: 0 raw, 1 warmup-average, 2/3/4 = AB order
        self._mode = jnp.asarray(np.minimum(np.arange(n), 4), jnp.int32)

    def init_state(self, shape, dtype=jnp.float32):
        ets = jnp.zeros((4, *shape), dtype)  # newest-first epsilon history
        cur_sample = jnp.zeros(shape, dtype)
        return (ets, cur_sample)

    def step(self, i, model_output, sample, state, key):
        ets, cur_sample = state
        e = model_output
        appended = jnp.concatenate([e[None], ets[:-1]], axis=0)
        mode = self._mode[i]

        combo = jnp.select(
            [mode == 0, mode == 1, mode == 2, mode == 3],
            [
                e,
                (e + ets[0]) / 2.0,
                (3.0 * appended[0] - appended[1]) / 2.0,
                (23.0 * appended[0] - 16.0 * appended[1] + 5.0 * appended[2]) / 12.0,
            ],
            (55.0 * appended[0] - 59.0 * appended[1] + 37.0 * appended[2] - 9.0 * appended[3])
            / 24.0,
        )
        append_flag = (mode != 1)[..., None]
        while append_flag.ndim < ets.ndim:
            append_flag = append_flag[..., None]
        new_ets = jnp.where(append_flag, appended, ets)

        sample_eff = jnp.where(mode == 1, cur_sample, sample)
        new_cur = jnp.where(mode == 0, sample, cur_sample)

        prev = self._sample_coeff[i] * sample_eff - self._diff_coeff[i] * combo
        return prev, (new_ets, new_cur)
