"""Diffusion schedule math — the numerics substrate.

Pure functions. Tables are built host-side in float64 numpy (outside jit) and
used as float32 jax arrays inside the sampling/training loops.

Behavioral parity targets (reference file:line):
  - beta schedules            lvdm/models/utils_diffusion.py:31-53
  - zero-terminal-SNR rescale lvdm/models/utils_diffusion.py:112-144
  - DDIM timestep selection   lvdm/models/utils_diffusion.py:56-76
  - DDIM sigma/alpha tables   lvdm/models/utils_diffusion.py:79-91
  - CFG guidance rescale      lvdm/models/utils_diffusion.py:147-158
  - sinusoidal time embedding lvdm/models/utils_diffusion.py:8-28
  - schedule registration     lvdm/models/ddpm3d.py:123-186
  - dynamic rescale array     lvdm/models/ddpm3d.py:522-527
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Beta schedules (host-side, float64)
# ---------------------------------------------------------------------------

def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule table, float64, shape (n_timestep,)."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = timesteps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=0, a_max=0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas to zero terminal SNR (arXiv:2305.08891, Algorithm 1)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)

    a0 = alphas_bar_sqrt[0].copy()
    aT = alphas_bar_sqrt[-1].copy()
    alphas_bar_sqrt = alphas_bar_sqrt - aT
    alphas_bar_sqrt = alphas_bar_sqrt * a0 / (a0 - aT)

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[0:1], alphas])
    return 1 - alphas


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """DDIM timestep subset, int64, ascending."""
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        steps = np.asarray(list(range(0, num_ddpm_timesteps, c))) + 1
    elif ddim_discr_method == "uniform_trailing":
        c = num_ddpm_timesteps / num_ddim_timesteps
        steps = np.flip(np.round(np.arange(num_ddpm_timesteps, 0, -c))).astype(np.int64) - 1
    elif ddim_discr_method == "quad":
        steps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int) + 1
    else:
        raise NotImplementedError(
            f'There is no ddim discretization method called "{ddim_discr_method}"'
        )
    return steps


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """Per-DDIM-step (sigma, alpha, alpha_prev) tables (arXiv:2010.02502)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


def make_dynamic_scale_arr(
    num_timesteps: int, base_scale: float = 0.7, turning_step: int = 400
) -> np.ndarray:
    """Dynamic-rescale array: linear 1.0->base over turning_step, then flat.

    Length turning_step + num_timesteps; indexed by DDPM timestep t.
    (reference: lvdm/models/ddpm3d.py:522-527)
    """
    scale_arr1 = np.linspace(1.0, base_scale, turning_step)
    scale_arr2 = np.full(num_timesteps, base_scale)
    return np.concatenate((scale_arr1, scale_arr2))


# ---------------------------------------------------------------------------
# jnp helpers (traceable)
# ---------------------------------------------------------------------------

# Cody-Waite split of 2*pi: C1 = 201/32 is exact in 8 significand bits, so
# n*C1 is exact in fp32 for the n (<~200) arising from timesteps < ~1300, and
# args - n*C1 is exact by Sterbenz. The residual terms recover ~1e-7 absolute
# accuracy in the reduced argument, where XLA's builtin fp32 range reduction
# would lose ~1e-3 for args ~1000.
_TWOPI_C1 = 6.28125
_TWOPI_C2 = float(np.float32(2 * np.pi - _TWOPI_C1))
_TWOPI_C3 = 2 * np.pi - _TWOPI_C1 - _TWOPI_C2


def _reduce_mod_2pi(args: jax.Array) -> jax.Array:
    """Accurately reduce fp32 args (|args| < ~1e4) into [-pi, pi]."""
    n = jnp.round(args * (1.0 / (2 * np.pi)))
    r = args - n * np.float32(_TWOPI_C1)
    r = r - n * np.float32(_TWOPI_C2)
    r = r - n * np.float32(_TWOPI_C3)
    return r


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: int = 10000
) -> jax.Array:
    """Sinusoidal timestep embedding, [cos | sin] layout, shape (N, dim)."""
    half = dim // 2
    # Static per dim: compute in float64 host-side (trace-time constant) —
    # XLA's fp32 exp is ~3e-6 off, which would shift low-frequency phases.
    freqs = jnp.asarray(
        np.exp(-math.log(max_period) * np.arange(half, dtype=np.float64) / half),
        dtype=jnp.float32,
    )
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    r = _reduce_mod_2pi(args)
    embedding = jnp.concatenate([jnp.cos(r), jnp.sin(r)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


def rescale_noise_cfg(
    noise_cfg: jax.Array, noise_pred_text: jax.Array, guidance_rescale: float = 0.0
) -> jax.Array:
    """Rescale CFG output std to the text-conditional std (arXiv:2305.08891 §3.4)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    # eps guards the degenerate all-zero-output case (e.g. freshly zero-init
    # models); for trained weights std_cfg is O(1) and this is a no-op.
    rescaled = noise_cfg * (std_text / jnp.maximum(std_cfg, 1e-12))
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg


def extract_into_tensor(a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather a[t] per batch element and reshape for broadcasting to ndim dims."""
    out = a[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


# ---------------------------------------------------------------------------
# Schedule containers
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Full DDPM schedule tables (float32 jnp arrays, length num_timesteps).

    Mirrors the buffers registered in lvdm/models/ddpm3d.py:123-186.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    lvlb_weights: jax.Array
    # Optional dynamic-rescale array (length turning_step + T), or None.
    scale_arr: Optional[jax.Array] = None

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    # --- q / v math (all per-batch-element via t indices) ---

    def q_sample(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        nd = x_start.ndim
        return (
            extract_into_tensor(self.sqrt_alphas_cumprod, t, nd) * x_start
            + extract_into_tensor(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def get_v(self, x: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        nd = x.ndim
        return (
            extract_into_tensor(self.sqrt_alphas_cumprod, t, nd) * noise
            - extract_into_tensor(self.sqrt_one_minus_alphas_cumprod, t, nd) * x
        )

    def predict_start_from_z_and_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            extract_into_tensor(self.sqrt_alphas_cumprod, t, nd) * x_t
            - extract_into_tensor(self.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def predict_eps_from_z_and_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            extract_into_tensor(self.sqrt_alphas_cumprod, t, nd) * v
            + extract_into_tensor(self.sqrt_one_minus_alphas_cumprod, t, nd) * x_t
        )

    def predict_start_from_noise(self, x_t, t, noise):
        nd = x_t.ndim
        return (
            extract_into_tensor(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract_into_tensor(self.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )


def build_schedule(
    *,
    timesteps: int = 1000,
    beta_schedule: str = "linear",
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
    given_betas: Optional[np.ndarray] = None,
    rescale_betas_zero_snr: bool = False,
    parameterization: str = "eps",
    v_posterior: float = 0.0,
    use_dynamic_rescale: bool = False,
    base_scale: float = 0.7,
    turning_step: int = 400,
) -> DiffusionSchedule:
    """Build all schedule tables in float64, return float32 jnp arrays."""
    if given_betas is not None:
        betas = np.asarray(given_betas, dtype=np.float64)
    else:
        betas = make_beta_schedule(
            beta_schedule, timesteps, linear_start=linear_start,
            linear_end=linear_end, cosine_s=cosine_s,
        )
    if rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev) / (
        1.0 - alphas_cumprod
    ) + v_posterior * betas

    if parameterization == "eps":
        # t=0 divides by posterior_variance[0] == 0 (inf, exactly like the
        # reference, ddpm3d.py:166-171); element 0 is overwritten below.
        with np.errstate(divide="ignore"):
            lvlb_weights = betas**2 / (
                2 * posterior_variance * alphas * (1 - alphas_cumprod)
            )
    elif parameterization == "x0":
        lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
    elif parameterization == "v":
        lvlb_weights = np.ones_like(betas)
    else:
        raise NotImplementedError(f"parameterization {parameterization}")
    lvlb_weights = np.asarray(lvlb_weights).copy()
    lvlb_weights[0] = lvlb_weights[1]

    # With zero-terminal-SNR, alphas_cumprod[-1] == 0: reciprocal tables are
    # inf there; the reference zeroes them for v-parameterization
    # (lvdm/models/ddpm3d.py:155-160).
    if parameterization != "v":
        sqrt_recip = np.sqrt(1.0 / alphas_cumprod)
        sqrt_recipm1 = np.sqrt(1.0 / alphas_cumprod - 1)
    else:
        sqrt_recip = np.zeros_like(alphas_cumprod)
        sqrt_recipm1 = np.zeros_like(alphas_cumprod)

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    scale_arr = None
    if use_dynamic_rescale:
        scale_arr = f32(make_dynamic_scale_arr(timesteps, base_scale, turning_step))

    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(sqrt_recip),
        sqrt_recipm1_alphas_cumprod=f32(sqrt_recipm1),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        lvlb_weights=f32(lvlb_weights),
        scale_arr=scale_arr,
    )


@dataclasses.dataclass(frozen=True)
class DDIMTable:
    """Per-DDIM-step tables, all shape (S,), index 0 = lowest timestep.

    The sampler scans indices S-1 .. 0 (reference lvdm/models/samplers/ddim.py:24-57).
    """

    timesteps: jax.Array          # int32, the DDPM t fed to the UNet
    alphas: jax.Array
    alphas_prev: jax.Array
    sqrt_one_minus_alphas: jax.Array
    sigmas: jax.Array
    scale_arr: Optional[jax.Array] = None       # dynamic rescale at step
    scale_arr_prev: Optional[jax.Array] = None

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def build_ddim_table(
    schedule: DiffusionSchedule,
    *,
    num_steps: int,
    discretize: str = "uniform",
    eta: float = 0.0,
) -> DDIMTable:
    """Build the DDIM sampling table from a DDPM schedule."""
    alphacums = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ddim_timesteps = make_ddim_timesteps(discretize, num_steps, schedule.num_timesteps)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        alphacums, ddim_timesteps, eta
    )
    scale_arr = scale_arr_prev = None
    if schedule.scale_arr is not None:
        sa = np.asarray(schedule.scale_arr)[ddim_timesteps]
        scale_arr = jnp.asarray(sa, dtype=jnp.float32)
        scale_arr_prev = jnp.asarray(
            np.concatenate([sa[0:1], sa[:-1]]), dtype=jnp.float32
        )
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DDIMTable(
        timesteps=jnp.asarray(ddim_timesteps, dtype=jnp.int32),
        alphas=f32(alphas),
        alphas_prev=f32(alphas_prev),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
        sigmas=f32(sigmas),
        scale_arr=scale_arr,
        scale_arr_prev=scale_arr_prev,
    )
