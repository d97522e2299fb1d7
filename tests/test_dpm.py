"""DPM-Solver++(2M) sampler verification.

No torch oracle exists (the reference ships only DDIM/DDPM samplers;
diffusers is not in this environment), so correctness is established
numerically:

1. On an analytically exact denoiser (Gaussian data => the posterior mean
   E[x0|x_t] is closed-form), both samplers solve the same probability-flow
   ODE. Against a fine-step reference solution, DPM++(2M) must show
   second-order error decay in the asymptotic regime (>=40 steps: measured
   ratio 3.2-3.6x when halving steps; DDIM's is ~1.9x) and beat DDIM at
   equal step count. Below ~40 steps the first-order endpoint steps (the
   first step and lower_order_final, both across huge lambda gaps) dominate
   the total error for BOTH solvers, so order ratios there are ~2.2-2.8 —
   asserting "ratio ~4" at 10-20 steps would test the toy's stiffness, not
   the solver.
2. On a tiny real UNet with the full 512/1024-config feature set
   (v-parameterization, ZTSNR, dynamic rescale, trailing spacing, 2-pass
   CFG + guidance rescale), (a) DPM++ at many steps must converge to the
   SAME trajectory as DDIM — the regression for the dynamic-rescale kernel
   (the naive "multiply the data prediction by scale_next/scale_t" variant
   diverges to a 0.18 relative offset); (b) at 20 and 50 steps DPM++ must
   beat DDIM at equal step count under production CFG 7.5.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicrafter_tpu import schedule as sched_lib
from dynamicrafter_tpu.sampling.ddim import SamplerSettings, ddim_sample
from dynamicrafter_tpu.sampling.dpm import dpm_sample


def _err(a, b):
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))


# ---------------------------------------------------------------------------
# Analytic model: x0 ~ N(mu, v*I)  =>  E[x0 | x_t] in closed form
# ---------------------------------------------------------------------------

def _gaussian_model_fn(schedule, mu, v, parameterization):
    """Exact posterior-mean denoiser for Gaussian data, as model_fn(x, t)."""

    def x0_mean(x, t):
        a = schedule.sqrt_alphas_cumprod[t][:, None]
        s2 = (schedule.sqrt_one_minus_alphas_cumprod[t][:, None]) ** 2
        return mu + (a * v / (a * a * v + s2)) * (x - a * mu)

    if parameterization == "eps":
        def model_fn(x, t):
            a = schedule.sqrt_alphas_cumprod[t][:, None]
            s = schedule.sqrt_one_minus_alphas_cumprod[t][:, None]
            return (x - a * x0_mean(x, t)) / s
    else:  # v: x0 = a*z - s*v_pred  =>  v_pred = (a*z - x0) / s
        def model_fn(x, t):
            a = schedule.sqrt_alphas_cumprod[t][:, None]
            s = schedule.sqrt_one_minus_alphas_cumprod[t][:, None]
            return (a * x - x0_mean(x, t)) / s
    return model_fn


def _run(sampler, model_fn, x_T, schedule, steps, discretize, param):
    table = sched_lib.build_ddim_table(
        schedule, num_steps=steps, discretize=discretize, eta=0.0)
    st = SamplerSettings(steps=steps, discretize=discretize, eta=0.0,
                         parameterization=param)
    fn = dpm_sample if sampler == "dpm" else ddim_sample
    return fn(model_fn, x_T, schedule, table, st)


@pytest.mark.parametrize("param,ztsnr,discretize", [
    ("eps", False, "uniform"),
    ("v", True, "uniform_trailing"),   # the 512/1024-config schedule regime
])
def test_gaussian_convergence_order(param, ztsnr, discretize):
    schedule = sched_lib.build_schedule(
        timesteps=1000, linear_start=0.00085, linear_end=0.012,
        parameterization=param, rescale_betas_zero_snr=ztsnr)
    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    x_T = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    model_fn = _gaussian_model_fn(schedule, mu, 0.5, param)

    ref = _run("dpm", model_fn, x_T, schedule, 500, discretize, param)
    # sanity: DDIM converges to the SAME limit (shared ODE). The gap here is
    # DDIM-500's own first-order error (~3.5e-3 measured, O(1/500) as
    # expected) — the second-order ref's is O(1/500^2), negligible.
    ddim_fine = _run("ddim", model_fn, x_T, schedule, 500, discretize, param)
    assert _err(ddim_fine, ref) < 6e-3

    e = {(s, k): _err(_run(s, model_fn, x_T, schedule, k, discretize, param),
                      ref)
         for s in ("dpm", "ddim") for k in (40, 80, 160)}

    # second order in the asymptotic regime: halving steps shrinks the
    # error ~3.2-3.6x (measured; the endpoint first-order steps keep it
    # below the ideal 4)
    assert 2.8 < e[("dpm", 40)] / e[("dpm", 80)] < 7.0, e
    assert 2.8 < e[("dpm", 80)] / e[("dpm", 160)] < 7.0, e
    # first order for DDIM (measured 1.89-1.95)
    assert 1.6 < e[("ddim", 40)] / e[("ddim", 80)] < 2.3, e
    assert 1.6 < e[("ddim", 80)] / e[("ddim", 160)] < 2.3, e
    # at equal steps, DPM++ is more accurate (measured 0.70x eps, 0.26x v)
    assert e[("dpm", 40)] < 0.75 * e[("ddim", 40)], e
    # in the shipped-config regime (v/ZTSNR/trailing), 20-step DPM++
    # matches 50-step DDIM (measured 0.0298 vs 0.0333); the eps/uniform toy
    # is endpoint-stiff at 20 steps and doesn't support the claim there
    if param == "v":
        e_dpm20 = _err(_run("dpm", model_fn, x_T, schedule, 20, discretize,
                            param), ref)
        e_ddim50 = _err(_run("ddim", model_fn, x_T, schedule, 50, discretize,
                             param), ref)
        assert e_dpm20 < e_ddim50, (e_dpm20, e_ddim50)


# ---------------------------------------------------------------------------
# Tiny real UNet, full 512/1024 schedule feature set
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_cfg_sampler():
    from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
    from dynamicrafter_tpu.sampling.ddim import (
        CFGConditioning, make_cfg_denoiser,
    )

    cfg = UNetConfig(in_channels=8, out_channels=4, model_channels=32,
                     attention_resolutions=(2, 1), num_res_blocks=1,
                     channel_mult=(1, 2), num_head_channels=16,
                     context_dim=48, temporal_length=4, fs_condition=True)
    m = UNetModel(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 8)), jnp.float32)
    ctx_t = jnp.asarray(rng.standard_normal((1, 7, 48)), jnp.float32)
    ctx_i = jnp.asarray(rng.standard_normal((1, 4, 5, 48)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([10]), ctx_t, ctx_i)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [l + jnp.asarray(0.05 * rng.standard_normal(l.shape), l.dtype)
              for l in leaves]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    schedule = sched_lib.build_schedule(
        timesteps=1000, linear_start=0.00085, linear_end=0.012,
        parameterization="v", rescale_betas_zero_snr=True,
        use_dynamic_rescale=True, base_scale=0.7)
    cond = CFGConditioning(
        context_text=jnp.stack([ctx_t * 0, ctx_t]),
        context_img=jnp.stack([ctx_i * 0, ctx_i]),
        concat=jnp.asarray(rng.standard_normal((2, 1, 4, 8, 8, 4)),
                           jnp.float32),
        fs=jnp.array([3], jnp.int32))
    x_T = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 4)), jnp.float32)
    unet_apply = lambda p, xx, tt, **kw: m.apply(p, xx, tt, **kw)

    def run(sampler, steps):
        st = SamplerSettings(steps=steps, discretize="uniform_trailing",
                             eta=0.0, cfg_scale=7.5, guidance_rescale=0.7,
                             parameterization="v")
        table = sched_lib.build_ddim_table(
            schedule, num_steps=steps, discretize="uniform_trailing", eta=0.0)
        fn = make_cfg_denoiser(unet_apply, params, cond, st)
        from dynamicrafter_tpu.sampling.unipc import unipc_sample
        sample = {"dpm": dpm_sample, "ddim": ddim_sample,
                  "unipc": unipc_sample}[sampler]

        @jax.jit
        def go(x0):
            return sample(fn, x0, schedule, table, st)

        return go(x_T)

    return run


@pytest.mark.slow
def test_dpm_tiny_unet_full_config(tiny_cfg_sampler):
    """Measured (CPU, this exact setup): dpm120=0.0062, dpm20=0.0531,
    dpm50=0.0320, ddim20=0.0851, ddim50=0.0398 vs the ddim200 trajectory."""
    run = tiny_cfg_sampler
    ref = run("ddim", 200)
    # (a) same-trajectory regression for the dynamic-rescale kernel: at 120
    # steps DPM++ must sit within fine-step discretization error of the
    # DDIM trajectory (the pre-fix naive rescale diverged to 0.18 here).
    e_dpm120 = _err(run("dpm", 120), ref)
    assert e_dpm120 < 0.015, e_dpm120
    # (b) equal-step-count superiority under production CFG 7.5
    e_dpm20 = _err(run("dpm", 20), ref)
    e_ddim20 = _err(run("ddim", 20), ref)
    e_dpm50 = _err(run("dpm", 50), ref)
    e_ddim50 = _err(run("ddim", 50), ref)
    assert e_dpm20 < 0.75 * e_ddim20, (e_dpm20, e_ddim20)
    assert e_dpm50 < e_ddim50, (e_dpm50, e_ddim50)


def test_dpm_chunked_dispatch_equals_single_scan():
    """The coeffs/carry_in/return_carry seam (used by dpm_certify to keep
    576x1024 programs under the runtime's single-dispatch limit) must be
    bit-exact vs the one-scan path on the maskless route."""
    from dynamicrafter_tpu.sampling.dpm import dpm_solver_pp_2m_coeffs

    schedule = sched_lib.build_schedule(
        timesteps=1000, parameterization="v", rescale_betas_zero_snr=True)
    rng = np.random.default_rng(3)
    mu = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    x_T = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    model_fn = _gaussian_model_fn(schedule, mu, 0.5, "v")
    table = sched_lib.build_ddim_table(
        schedule, num_steps=20, discretize="uniform_trailing", eta=0.0)
    st = SamplerSettings(steps=20, discretize="uniform_trailing", eta=0.0,
                         parameterization="v")
    full = dpm_sample(model_fn, x_T, schedule, table, st)
    per = dpm_solver_pp_2m_coeffs(table)
    x, p = x_T, jnp.zeros_like(x_T)
    for k in range(4):
        ch = jax.tree_util.tree_map(lambda a: a[k * 5:(k + 1) * 5], per)
        x, p = dpm_sample(model_fn, x, schedule, table, st,
                          coeffs=ch, carry_in=p, return_carry=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(x))


def test_dpm_chunked_mask_requires_presliced_noise():
    """In-scan mask-noise draws thread a PRNG key through the scan, which
    chunking would replay per chunk — rejected with a clear error."""
    from dynamicrafter_tpu.sampling.dpm import dpm_solver_pp_2m_coeffs

    schedule = sched_lib.build_schedule(timesteps=1000)
    table = sched_lib.build_ddim_table(schedule, num_steps=10,
                                       discretize="uniform", eta=0.0)
    per = dpm_solver_pp_2m_coeffs(table)
    ch = jax.tree_util.tree_map(lambda a: a[:5], per)
    z = jnp.zeros((1, 4))
    with pytest.raises(ValueError, match="pre-drawn mask_noise"):
        dpm_sample(lambda x, t: x, z, schedule, table,
                   SamplerSettings(steps=10, parameterization="eps"),
                   coeffs=ch, mask=jnp.ones_like(z), x0=z)


def test_dpm_rejects_deepcache():
    schedule = sched_lib.build_schedule(timesteps=1000)
    table = sched_lib.build_ddim_table(schedule, num_steps=10,
                                       discretize="uniform", eta=0.0)
    st = SamplerSettings(steps=10, deepcache=5)
    with pytest.raises(ValueError, match="deepcache"):
        dpm_sample(lambda x, t: x, jnp.zeros((1, 4)), schedule, table, st)


@pytest.mark.slow
def test_dpm_certify_plumbing(tmp_path):
    """scripts/dpm_certify.run_config on the tiny config: rows well-formed,
    DPM at the reference step count is self-consistent (0 error), and the
    second-order candidate beats the first-order one at equal steps."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import jax.numpy as jnp
    from dpm_certify import run_config
    from dynamicrafter_tpu.config import ModelConfig
    from tiny_config import TINY_MODEL_CONFIG

    mc = ModelConfig(TINY_MODEL_CONFIG)
    rows = run_config(mc, 8, 8, [("dpm", 24), ("dpm", 8), ("ddim", 8)],
                      ref_steps=24, passes=2, dtype=jnp.float32)
    by = {(r["sampler"], r["steps"]): r for r in rows}
    assert by[("dpm", 24)]["rel_l2_vs_ref"] == 0.0   # ref reproduced exactly
    assert np.isfinite(by[("dpm", 8)]["latent_psnr_db"])
    assert (by[("dpm", 8)]["rel_l2_vs_ref"]
            < by[("ddim", 8)]["rel_l2_vs_ref"])
