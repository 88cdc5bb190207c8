"""DPM-Solver++ (2M multistep) sampler — table-driven.

Capability parity with the reference's DPMSolverMultistepScheduler registry
entry (reference: modules/controlanimate_pipeline.py:55,66). Implements the
data-prediction (dpmsolver++) multistep solver of order 2 with
lower-order-final stabilization for few-step sampling.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Scheduler, register
from .common import DiffusionSchedule, truncate_for_strength


@register("DPMSolverMultistepScheduler")
class DPMSolverMultistepScheduler(Scheduler):
    order = 2

    def __init__(
        self,
        schedule: DiffusionSchedule,
        num_inference_steps: int,
        strength: float = 1.0,
        prediction_type: str = "epsilon",
        solver_order: int = 2,
        lower_order_final: bool = True,
    ):
        super().__init__(schedule)
        T = schedule.num_train_timesteps
        S = num_inference_steps
        ts = (
            np.linspace(0, T - 1, S + 1).round()[::-1][:-1].astype(np.int64).copy()
        )
        ts = truncate_for_strength(ts, S, strength)
        self.timesteps = ts
        n = len(ts)
        self.num_steps = n
        self.init_noise_sigma = 1.0
        self.prediction_type = prediction_type

        abar = schedule.alphas_cumprod
        alpha = np.sqrt(abar)
        sigma = np.sqrt(1.0 - abar)
        lam = np.log(alpha) - np.log(sigma)

        t_cur = ts
        t_prev = np.concatenate([ts[1:], [0]])
        t_prevprev = np.concatenate([[ts[0]], ts[:-1]])  # t_{i-1} (unused at i=0)

        a_t, s_t, l_t = alpha[t_cur], sigma[t_cur], lam[t_cur]
        a_p, s_p, l_p = alpha[t_prev], sigma[t_prev], lam[t_prev]
        l_pp = lam[t_prevprev]

        h = l_p - l_t
        h_0 = l_t - l_pp
        r0 = np.where(h != 0, h_0 / np.where(h == 0, 1.0, h), 1.0)

        self._a_t = jnp.asarray(a_t, jnp.float32)
        self._s_t = jnp.asarray(s_t, jnp.float32)
        self._sigma_ratio = jnp.asarray(s_p / s_t, jnp.float32)
        self._alpha_expm1 = jnp.asarray(a_p * (np.exp(-h) - 1.0), jnp.float32)
        self._inv_r0 = jnp.asarray(np.where(r0 != 0, 1.0 / np.where(r0 == 0, 1.0, r0), 0.0), jnp.float32)

        first_order = np.zeros(n, dtype=bool)
        first_order[0] = True
        if lower_order_final and n < 15 and n >= 1:
            first_order[-1] = True
        self._first_order = jnp.asarray(first_order)

    def init_state(self, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)  # previous x0 estimate

    def step(self, i, model_output, sample, state, key):
        a_t, s_t = self._a_t[i], self._s_t[i]
        if self.prediction_type == "epsilon":
            x0 = (sample - s_t * model_output) / a_t
        elif self.prediction_type == "v_prediction":
            x0 = a_t * sample - s_t * model_output
        else:
            x0 = model_output

        d0 = x0
        d1 = (x0 - state) * self._inv_r0[i]
        base = self._sigma_ratio[i] * sample - self._alpha_expm1[i] * d0
        second = base - 0.5 * self._alpha_expm1[i] * d1
        prev = jnp.where(self._first_order[i], base, second)
        return prev, x0
