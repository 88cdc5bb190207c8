"""DDIM inversion: encode a clean latent back up the DDIM trajectory.

Counterpart of the reference's debug helpers (animatediff/utils/util.py:
`next_step` :64-74, `ddim_loop` :81-92, `ddim_inversion` :94-99): run the
deterministic DDIM ODE in reverse (t=0 -> t=T) with conditional-only
epsilon predictions, collecting every intermediate latent.

TPU-native shape: one `lax.scan` over precomputed alpha tables (host numpy,
like every scheduler here) instead of a Python loop of eager UNet calls —
the whole inversion jits into a single program with static shapes. The
caller supplies `eps_fn(latents, t, context)`, typically a closure over
`UNet3DConditionModel.apply`, so the helper stays model-agnostic (and
testable against analytic epsilon oracles).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..schedulers.common import DiffusionSchedule, leading_timesteps


def ddim_inversion(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    schedule: DiffusionSchedule,
    latents: jnp.ndarray,
    num_inv_steps: int,
    context: jnp.ndarray,
    steps_offset: int = 1,
    set_alpha_to_one: bool = True,
) -> jnp.ndarray:
    """Invert `latents` (the clean x_0-side sample) up the DDIM trajectory.

    Returns (num_inv_steps + 1, *latents.shape): index 0 is the input,
    index i the latent at the i-th inversion step — the same list the
    reference's `ddim_loop` accumulates (util.py:84-91), stacked.

    Each step runs the reference's `next_step` update for timestep pair
    (t - T//steps -> t), iterating t ascending (util.py:88 indexes the
    sampler's timesteps back to front): with a_t = abar[t - ratio] (or the
    final alpha below 0) and a_next = abar[t],

        x0   = (x - sqrt(1 - a_t) * eps) / sqrt(a_t)
        x'   = sqrt(a_next) * x0 + sqrt(1 - a_next) * eps

    which is exactly the inverse of the eta=0 DDIM sampler step under the
    locally-constant-epsilon assumption, so sampling back down with
    DDIMScheduler retraces the trajectory.
    """
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    T = len(abar)
    ratio = T // num_inv_steps
    # sampler timesteps are descending; invert ascending (util.py:88)
    ts = leading_timesteps(T, num_inv_steps, steps_offset)[::-1].copy()
    prev = np.minimum(ts - ratio, T - 1)  # util.py:66 clamps to 999
    final_alpha = 1.0 if set_alpha_to_one else abar[0]
    a_t = np.where(prev >= 0, abar[np.clip(prev, 0, None)], final_alpha)
    a_next = abar[ts]

    a_t_j = jnp.asarray(np.sqrt(a_t), jnp.float32)
    b_t_j = jnp.asarray(np.sqrt(1.0 - a_t), jnp.float32)
    a_n_j = jnp.asarray(np.sqrt(a_next), jnp.float32)
    b_n_j = jnp.asarray(np.sqrt(1.0 - a_next), jnp.float32)
    ts_j = jnp.asarray(ts, jnp.int32)

    def step(lat, inp):
        sa_t, sb_t, sa_n, sb_n, t = inp
        eps = eps_fn(lat, t, context).astype(lat.dtype)
        x0 = (lat - sb_t * eps) / sa_t
        nxt = sa_n * x0 + sb_n * eps
        return nxt, nxt

    _, trail = lax.scan(step, latents, (a_t_j, b_t_j, a_n_j, b_n_j, ts_j))
    return jnp.concatenate([latents[None], trail], axis=0)
