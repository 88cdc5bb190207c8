"""Linear multistep (LMS) sampler — Adams-Bashforth over the sigma ODE.

Capability parity with the reference's LMSDiscreteScheduler registry entry
(reference: modules/controlanimate_pipeline.py:58,70). All Lagrange
integral coefficients are precomputed on host at init into an (S, order)
matrix so the scanned step is a shift + weighted sum.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import integrate

from .base import register
from .euler import _SigmaScheduler


@register("LMSDiscreteScheduler")
class LMSDiscreteScheduler(_SigmaScheduler):
    order = 4

    def __init__(self, schedule, num_inference_steps, strength=1.0, prediction_type="epsilon"):
        super().__init__(schedule, num_inference_steps, strength)
        self.prediction_type = prediction_type
        S = self.num_steps
        sig = self._sigmas_np
        coeffs = np.zeros((S, self.order), dtype=np.float64)
        for i in range(S):
            k = min(i + 1, self.order)
            for j in range(k):
                def lms_deriv(s, i=i, j=j, k=k):
                    prod = 1.0
                    for m in range(k):
                        if m == j:
                            continue
                        prod *= (s - sig[i - m]) / (sig[i - j] - sig[i - m])
                    return prod

                coeffs[i, j] = integrate.quad(lms_deriv, sig[i], sig[i + 1], epsrel=1e-8)[0]
        self._coeffs = jnp.asarray(coeffs, jnp.float32)

    def init_state(self, shape, dtype=jnp.float32):
        # derivative history, newest first
        return jnp.zeros((self.order, *shape), dtype)

    def step(self, i, model_output, sample, state, key):
        sigma = self.sigmas[i]
        x0 = self._pred_x0(model_output, sample, sigma, self.prediction_type)
        derivative = (sample - x0) / sigma
        hist = jnp.concatenate([derivative[None], state[:-1]], axis=0)
        c = self._coeffs[i]  # (order,)
        update = jnp.tensordot(c.astype(hist.dtype), hist, axes=(0, 0))
        return sample + update, hist
