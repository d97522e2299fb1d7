"""DDIM sampling as a single jitted lax.scan.

Behavioral parity targets:
  * standard sampler + CFG      lvdm/models/samplers/ddim.py:134-279
  * two-axis (multi-cond) CFG   lvdm/models/samplers/ddim_multiplecond.py:210-285
  * mask/x0 latent blending     ddim.py:173-180
  * v-parameterization          ddim.py:231-234, 257-260
  * dynamic rescale             ddim.py:262-266
  * guidance rescale            utils_diffusion.py:147-158

TPU-first design (vs the reference's Python step loop):
  * the whole 50-step loop is one lax.scan inside one jit — zero host
    round-trips during sampling;
  * the 2 (or 3) CFG passes run as ONE batched UNet call (the reference runs
    them serially, ddim.py:220-226) — better MXU utilization at identical
    math;
  * per-step noise is either a pre-drawn (S, ...) array (parity harness) or
    drawn in-scan from a folded PRNG key.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamicrafter_tpu.schedule import (
    DDIMTable,
    DiffusionSchedule,
    rescale_noise_cfg,
)


@dataclasses.dataclass(frozen=True)
class SamplerSettings:
    steps: int = 50
    discretize: str = "uniform"
    eta: float = 0.0
    cfg_scale: float = 7.5
    cfg_img: Optional[float] = None        # multi-cond second axis; None = off
    guidance_rescale: float = 0.0
    temperature: float = 1.0
    parameterization: str = "v"
    clean_cond: bool = False               # mask blending uses clean x0
    sequential_cfg: bool = False           # run CFG passes serially (memory
                                           # fallback for 1024-res single-chip)
    deepcache: int = 1                     # N>1: recompute the UNet's deep
                                           # levels every N steps, reuse the
                                           # cached deep feature in between
                                           # (DeepCache, Ma et al. CVPR'24;
                                           # opt-in approximation, no
                                           # reference counterpart)
    sampler: str = "ddim"                  # "ddim" (reference surface),
                                           # "dpm" = DPM-Solver++(2M)
                                           # (sampling/dpm.py; deterministic,
                                           # ~1.7x fewer steps at DDIM-50
                                           # quality — beyond reference), or
                                           # "unipc" = UniPC-style 3rd-order
                                           # predictor-corrector
                                           # (sampling/unipc.py)
    solver_order: int = 2                  # unipc only: 1..3 (2 = measured
                                           # best under CFG guidance)
    use_corrector: bool = True             # unipc only: apply UniC


class CFGConditioning(NamedTuple):
    """Stacked conditioning for 1..3 batched CFG passes.

    Pass order along the stacked batch axis: [uncond, (uncond_img,) cond] —
    uncond first so the unconditional pass is always slice 0.
    Each field is stacked along a new leading pass axis P, later folded into
    batch for the single UNet call.
    """

    context_text: jax.Array             # (P, B, Lt, C)
    context_img: Optional[jax.Array]    # (P, B, T, Li, C) or None
    concat: Optional[jax.Array]         # (P, B, T, h, w, Cc) or None
    fs: Optional[jax.Array]             # (B,) shared across passes

    @property
    def num_passes(self) -> int:
        return self.context_text.shape[0]


def make_cfg_denoiser(
    unet_apply: Callable,
    params,
    cond: CFGConditioning,
    settings: SamplerSettings,
) -> Callable:
    """Build model_fn(x, t) -> CFG-combined model output.

    Runs all passes as one UNet call with batch P*B, then applies
      standard: e = e_uc + s*(e_c - e_uc)                      (ddim.py:226)
      multicond: e = e_uc + s_img*(e_uc_img - e_uc)
                   + s_txt*(e_c - e_uc_img)      (ddim_multiplecond.py:230-236)
    plus optional guidance-rescale against the conditional pass.
    """
    p = cond.num_passes

    def model_fn(x: jax.Array, t: jax.Array, cache=None, return_cache=False):
        b = x.shape[0]
        xc = x
        # DeepCache kwargs are forwarded to unet_apply ONLY when in use, so
        # plain 6-arg unet_apply callables (tests, bench) keep working.
        dc_kw = {}
        if return_cache:
            dc_kw["return_cache"] = True
        cache_out = None
        if settings.sequential_cfg and p > 1:
            # serial passes: peak activation memory of ONE pass (the
            # reference's layout, ddim.py:220-226) — for single-chip 1024
            outs, caches = [], []
            for i in range(p):
                xi = xc if cond.concat is None else jnp.concatenate(
                    [xc, cond.concat[i]], axis=-1)
                kw = dict(dc_kw)
                if cache is not None:
                    kw["cache"] = cache[i]
                o = unet_apply(
                    params, xi, t,
                    context_text=cond.context_text[i],
                    context_img=(None if cond.context_img is None
                                 else cond.context_img[i]),
                    fs=cond.fs, **kw,
                )
                if return_cache:
                    o, c = o
                    caches.append(c)
                outs.append(o)
            out = jnp.stack(outs)
            if return_cache:
                cache_out = jnp.stack(caches)
        else:
            if cond.concat is not None:
                # hybrid conditioning: per-pass channel concat
                # (ddpm3d.py:1254-1258)
                xs = jnp.broadcast_to(xc[None], (p, *xc.shape))
                xs = jnp.concatenate([xs, cond.concat], axis=-1)
            else:
                xs = jnp.broadcast_to(xc[None], (p, *xc.shape))
            flat = lambda a: a.reshape(p * b, *a.shape[2:])
            ctx_img = (None if cond.context_img is None
                       else flat(cond.context_img))
            fs = None if cond.fs is None else jnp.tile(cond.fs, p)
            if cache is not None:
                dc_kw["cache"] = cache
            out = unet_apply(
                params, flat(xs), jnp.tile(t, p),
                context_text=flat(cond.context_text),
                context_img=ctx_img, fs=fs, **dc_kw,
            )
            if return_cache:
                out, cache_out = out
            out = out.reshape(p, b, *out.shape[1:])
        ret = lambda e: (e, cache_out) if return_cache else e
        if p == 1:
            return ret(out[0])
        if p == 2:
            e_uc, e_c = out[0], out[1]
            e = e_uc + settings.cfg_scale * (e_c - e_uc)
        else:
            e_uc, e_uc_img, e_c = out[0], out[1], out[2]
            s_img = settings.cfg_img if settings.cfg_img is not None \
                else settings.cfg_scale
            e = (e_uc + s_img * (e_uc_img - e_uc)
                 + settings.cfg_scale * (e_c - e_uc_img))
        if settings.guidance_rescale > 0.0:
            e = rescale_noise_cfg(e, e_c, settings.guidance_rescale)
        return ret(e)

    return model_fn


def make_mask_blend(schedule, settings, mask, x0):
    """Inpaint-style latent blending closure (reference ddim.py:173-180),
    shared by ddim_sample / dpm_sample / unipc_sample: replace the masked
    region with (optionally noised) x0 before each model call."""

    def blend(x, key, step, t):
        if mask is None:
            return x, key
        assert x0 is not None
        if settings.clean_cond:
            img_orig = x0
        else:
            mnoise = step.get("mask_noise")
            if mnoise is None:
                key, sub = jax.random.split(key)
                mnoise = jax.random.normal(sub, x.shape, x.dtype)
            img_orig = schedule.q_sample(x0, t, mnoise)
        return img_orig * mask + (1.0 - mask) * x, key

    return blend


def reject_ode_unsupported(settings: SamplerSettings, table: DDIMTable,
                           sampler: str) -> None:
    """Shared trace-time guards for the deterministic ODE solvers
    (dpm/unipc): DeepCache quality certification is DDIM-only, and
    eps-parameterization cannot recover x0 at a zero-terminal-SNR
    endpoint (divides by sqrt(alpha_bar)=0 at t=999)."""
    if settings.deepcache > 1:
        raise ValueError("deepcache is only certified with the DDIM "
                         f"sampler; run {sampler} without it")
    if (settings.parameterization != "v"
            and float(np.min(np.asarray(table.alphas))) < 1e-8):
        raise ValueError(
            "eps-parameterization with a zero-terminal-SNR schedule is "
            "unsupported: x0 = (x - sigma*eps)/sqrt(alpha_bar) divides by "
            "zero at the t=999 endpoint; use v-parameterization")


def ddim_sample(
    model_fn: Callable,
    x_T: jax.Array,
    schedule: DiffusionSchedule,
    table: DDIMTable,
    settings: SamplerSettings,
    *,
    noise: Optional[jax.Array] = None,   # (S, *x.shape) pre-drawn step noise
    rng: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    x0: Optional[jax.Array] = None,
    mask_noise: Optional[jax.Array] = None,  # (S, *x.shape) for q_sample blend
    log_every_t: Optional[int] = None,
) -> jax.Array:
    """Run the full DDIM loop; returns the final latent.

    model_fn(x, t) must return the (already CFG-combined) model output.

    log_every_t: when set, additionally return the reference sampler's
    intermediates dict (ddim.py:157,199-201) — {"x_inter", "pred_x0"}, each
    (n_logs+1, *x.shape) seeded with x_T, saved whenever the descending step
    index satisfies index % log_every_t == 0 or index == steps-1.
    """
    s = table.num_steps
    b = x_T.shape[0]
    nd = x_T.ndim
    bshape = (b,) + (1,) * (nd - 1)

    idx = jnp.arange(s - 1, -1, -1)
    per_step = {
        "t": table.timesteps[idx],
        "a_t": table.alphas[idx],
        "a_prev": table.alphas_prev[idx],
        "sqrt_1m_a": table.sqrt_one_minus_alphas[idx],
        "sigma": table.sigmas[idx],
        "i": jnp.arange(s),
    }
    if table.scale_arr is not None:
        per_step["rescale"] = table.scale_arr_prev[idx] / table.scale_arr[idx]
    if noise is not None:
        per_step["noise"] = noise
    if mask is not None and mask_noise is not None:
        per_step["mask_noise"] = mask_noise
    if log_every_t is not None:
        from dynamicrafter_tpu.sampling.ancestral import log_slots

        # reference "index" counts down from s-1 (ddim.py:171,199)
        ref_index = np.arange(s - 1, -1, -1)
        n_logs, slots = log_slots(
            (ref_index % log_every_t == 0) | (ref_index == s - 1))
        per_step["slot"] = slots

    use_eta_noise = settings.eta > 0.0
    _blend = make_mask_blend(schedule, settings, mask, x0)

    def _update(x, key, step, t, model_output):
        if settings.parameterization == "v":
            e_t = schedule.predict_eps_from_z_and_v(x, t, model_output)
            pred_x0 = schedule.predict_start_from_z_and_v(x, t, model_output)
        else:
            e_t = model_output
            pred_x0 = (x - step["sqrt_1m_a"] * e_t) / jnp.sqrt(step["a_t"])

        if "rescale" in step:
            pred_x0 = pred_x0 * step["rescale"]

        dir_xt = jnp.sqrt(1.0 - step["a_prev"] - step["sigma"] ** 2) * e_t

        if use_eta_noise:
            n = step.get("noise")
            if n is None:
                key, sub = jax.random.split(key)
                n = jax.random.normal(sub, x.shape, x.dtype)
            x_prev = (jnp.sqrt(step["a_prev"]) * pred_x0 + dir_xt
                      + step["sigma"] * n * settings.temperature)
        else:
            x_prev = jnp.sqrt(step["a_prev"]) * pred_x0 + dir_xt
        return x_prev, key, pred_x0

    if rng is None:
        rng = jax.random.PRNGKey(0)

    if settings.deepcache > 1 and log_every_t is not None:
        raise ValueError("log_every_t intermediates require the exact "
                         "sampler (deepcache=1)")

    if settings.deepcache > 1:
        # DeepCache: outer scan over groups of N steps. Step 0 of each group
        # runs the full UNet and emits the deep-feature cache; steps 1..N-1
        # run as an INNER scan of shallow forwards closing over the cache —
        # XLA compiles exactly two UNet graphs (one full, one shallow), no
        # lax.cond and no per-step unrolled copies.
        n_dc = settings.deepcache
        if s % n_dc != 0:
            raise ValueError(
                f"deepcache interval {n_dc} must divide steps={s}")
        grouped = jax.tree_util.tree_map(
            lambda a: a.reshape(s // n_dc, n_dc, *a.shape[1:]), per_step)

        def body_dc(carry, gsteps):
            x, key = carry
            step0 = jax.tree_util.tree_map(lambda a: a[0], gsteps)
            t0 = jnp.full((b,), step0["t"], dtype=jnp.int32)
            x, key = _blend(x, key, step0, t0)
            model_output, cache = model_fn(x, t0, return_cache=True)
            x, key, _ = _update(x, key, step0, t0, model_output)

            def shallow(carry2, step):
                x2, key2 = carry2
                t = jnp.full((b,), step["t"], dtype=jnp.int32)
                x2, key2 = _blend(x2, key2, step, t)
                out = model_fn(x2, t, cache=cache)
                x2, key2, _ = _update(x2, key2, step, t, out)
                return (x2, key2), None

            rest = jax.tree_util.tree_map(lambda a: a[1:], gsteps)
            (x, key), _ = jax.lax.scan(shallow, (x, key), rest)
            return (x, key), None

        (x, _), _ = jax.lax.scan(body_dc, (x_T, rng), grouped)
        return x

    if log_every_t is not None:
        def body_log(carry, step):
            x, key, bx, bp = carry
            t = jnp.full((b,), step["t"], dtype=jnp.int32)
            x, key = _blend(x, key, step, t)
            model_output = model_fn(x, t)
            x, key, pred_x0 = _update(x, key, step, t, model_output)
            bx = bx.at[step["slot"]].set(x, mode="drop")
            bp = bp.at[step["slot"]].set(pred_x0, mode="drop")
            return (x, key, bx, bp), None

        buf = jnp.zeros((n_logs, *x_T.shape), x_T.dtype)
        (x, _, bx, bp), _ = jax.lax.scan(
            body_log, (x_T, rng, buf, buf), per_step)
        # seeded with x_T in BOTH lists (reference ddim.py:157)
        return x, {"x_inter": jnp.concatenate([x_T[None], bx]),
                   "pred_x0": jnp.concatenate([x_T[None], bp])}

    def body(carry, step):
        x, key = carry
        t = jnp.full((b,), step["t"], dtype=jnp.int32)
        x, key = _blend(x, key, step, t)
        model_output = model_fn(x, t)
        x, key, _ = _update(x, key, step, t, model_output)
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x_T, rng), per_step)
    return x


def ddim_decode(
    model_fn: Callable,
    x_latent: jax.Array,
    schedule: DiffusionSchedule,
    table: DDIMTable,
    settings: SamplerSettings,
    t_start: int,
) -> jax.Array:
    """img2img: denoise from DDIM step t_start down to 0 (ddim.py:281-301).

    Runs the same scan as ddim_sample but only over the first t_start
    timesteps of the table (the reference truncates `timesteps[:t_start]`).
    """
    truncated = DDIMTable(
        timesteps=table.timesteps[:t_start],
        alphas=table.alphas[:t_start],
        alphas_prev=table.alphas_prev[:t_start],
        sqrt_one_minus_alphas=table.sqrt_one_minus_alphas[:t_start],
        sigmas=table.sigmas[:t_start],
        scale_arr=None if table.scale_arr is None else table.scale_arr[:t_start],
        scale_arr_prev=None if table.scale_arr_prev is None
        else table.scale_arr_prev[:t_start],
    )
    return ddim_sample(model_fn, x_latent, schedule, truncated, settings)


def stochastic_encode(
    schedule: DiffusionSchedule,
    table: DDIMTable,
    x0: jax.Array,
    t_index: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """img2img entry: noise x0 to DDIM step t_index (ddim.py:303-317)."""
    sqrt_a = jnp.sqrt(table.alphas)
    sqrt_1m = table.sqrt_one_minus_alphas
    nd = x0.ndim
    ga = sqrt_a[t_index].reshape(-1, *((1,) * (nd - 1)))
    g1 = sqrt_1m[t_index].reshape(-1, *((1,) * (nd - 1)))
    return ga * x0 + g1 * noise
