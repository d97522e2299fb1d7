"""Ancestral (DDPM) sampling with logged intermediates — the reference's
debugging / ImageLogger surface.

Behavioral parity targets:
  * p_mean_variance / q_posterior   lvdm/models/ddpm3d.py:881-903, 253-262
  * p_sample (latent variant)       lvdm/models/ddpm3d.py:905-925
  * p_sample_loop + intermediates   lvdm/models/ddpm3d.py:928-973
    (saved when i % log_every_t == 0 or i == timesteps-1, seeded with x_T)

TPU-first design: the full T-step loop is one lax.scan inside one jit.
Intermediates are written into a static-shaped (n_logs, ...) buffer via
per-step slot indices (non-logged steps write to an out-of-range slot with
mode="drop") — no dynamic shapes, no host round-trips.

Note: the reference's ancestral path supports eps/x0 parameterizations only
(p_mean_variance raises NotImplementedError for "v", ddpm3d.py:889-896); we
additionally support "v" via predict_start_from_z_and_v since every shipped
DynamiCrafter config is v-parameterized.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamicrafter_tpu.schedule import DiffusionSchedule, extract_into_tensor


def log_slots(save: np.ndarray) -> Tuple[int, jnp.ndarray]:
    """Per-step write slots for a static intermediates buffer.

    save: host-side bool array, one per scan step. Steps with save=False get
    slot n (out of range) and are dropped by `.at[slot].set(x, mode="drop")`.
    """
    save = np.asarray(save, dtype=bool)
    n = int(save.sum())
    slots = np.where(save, np.cumsum(save) - 1, n)
    return n, jnp.asarray(slots, jnp.int32)


def p_sample_loop(
    model_fn: Callable,
    x_T: jax.Array,
    schedule: DiffusionSchedule,
    *,
    parameterization: str = "eps",
    clip_denoised: bool = False,
    temperature: float = 1.0,
    timesteps: Optional[int] = None,
    start_T: Optional[int] = None,
    log_every_t: int = 100,
    noise: Optional[jax.Array] = None,       # (T, *x.shape) pre-drawn
    rng: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    x0: Optional[jax.Array] = None,
    mask_noise: Optional[jax.Array] = None,  # (T, *x.shape) for q_sample
    return_intermediates: bool = False,
):
    """Full ancestral DDPM sampling loop (ddpm3d.py:928-973).

    model_fn(x, t) -> model output (already CFG-combined if desired; the
    reference's ancestral path never applies CFG — "classifier_free_guidance
    sampling is only supported by DDIM", ddpm3d.py:833).

    Returns the final latent, or (latent, intermediates) where intermediates
    has shape (n_logs+1, *x.shape) seeded with x_T (reference line 941).
    """
    T = schedule.num_timesteps if timesteps is None else timesteps
    if start_T is not None:
        T = min(T, start_T)
    b = x_T.shape[0]
    bshape = (b,) + (1,) * (x_T.ndim - 1)

    i_vals = np.arange(T - 1, -1, -1)                  # descending, like ref
    save = (i_vals % log_every_t == 0) | (i_vals == T - 1)
    n_logs, slots = log_slots(save)

    per_step = {"i": jnp.asarray(i_vals, jnp.int32), "slot": slots}
    if noise is not None:
        per_step["noise"] = noise
    if mask is not None and mask_noise is not None:
        per_step["mask_noise"] = mask_noise
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def body(carry, step):
        x, key, buf = carry
        t = jnp.full((b,), step["i"], dtype=jnp.int32)

        model_out = model_fn(x, t)
        if parameterization == "eps":
            x_recon = schedule.predict_start_from_noise(x, t, model_out)
        elif parameterization == "x0":
            x_recon = model_out
        elif parameterization == "v":
            x_recon = schedule.predict_start_from_z_and_v(x, t, model_out)
        else:
            raise NotImplementedError(parameterization)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)

        # q_posterior (ddpm3d.py:253-262)
        mean = (extract_into_tensor(schedule.posterior_mean_coef1, t, x.ndim)
                * x_recon
                + extract_into_tensor(schedule.posterior_mean_coef2, t, x.ndim)
                * x)
        log_var = extract_into_tensor(
            schedule.posterior_log_variance_clipped, t, x.ndim)

        n = step.get("noise")
        if n is None:
            key, sub = jax.random.split(key)
            n = jax.random.normal(sub, x.shape, x.dtype)
        # no noise when t == 0 (ddpm3d.py:920)
        nonzero = 1.0 - (t == 0).astype(x.dtype).reshape(bshape)
        x = mean + nonzero * jnp.exp(0.5 * log_var) * n * temperature

        if mask is not None:
            # blend AFTER the update (reference loop order, ddpm3d.py:961-963)
            assert x0 is not None
            mn = step.get("mask_noise")
            if mn is None:
                key, sub = jax.random.split(key)
                mn = jax.random.normal(sub, x.shape, x.dtype)
            img_orig = schedule.q_sample(x0, t, mn)
            x = img_orig * mask + (1.0 - mask) * x

        buf = buf.at[step["slot"]].set(x, mode="drop")
        return (x, key, buf), None

    buf0 = jnp.zeros((n_logs, *x_T.shape), x_T.dtype)
    (x, _, buf), _ = jax.lax.scan(body, (x_T, rng, buf0), per_step)
    if return_intermediates:
        return x, jnp.concatenate([x_T[None], buf], axis=0)
    return x
