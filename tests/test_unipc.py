"""UniPC-style predictor-corrector sampler verification.

Same strategy as tests/test_dpm.py (no torch/diffusers oracle exists):

1. Exactness anchor: order=1 with the corrector off IS the DDIM eta=0 map
   — trajectories must agree to fp32 tolerance in both schedule regimes.
2. Analytic Gaussian oracle, eps/uniform regime (no ZTSNR lambda cliff):
   clean higher-order behavior — at 40/80/160 steps UniPC-3 must beat
   DPM++(2M) by a wide margin (measured 0.65x/0.47x/0.41x) and its
   halving-ratio must exceed second order's (measured 4.8x / 3.7x vs
   DPM's ~3.4x).
3. Analytic oracle, SHIPPED v/ZTSNR/trailing regime: the huge first
   lambda gap flattens every solver toward endpoint error; UniPC's edge
   is at low step counts only. Assert the default (order=2 + corrector)
   beats DPM++(2M) at 10 and 16 steps (measured 0.86x / 0.91x) — NOT at
   30+, where they tie (documented in sampling/unipc.py).
4. Tiny real UNet, full 512-config feature set + CFG 7.5 (slow tier):
   trajectory consistency with DDIM at many steps (dynamic-rescale kernel
   regression) and the low-step edge over both DDIM and DPM.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicrafter_tpu import schedule as sched_lib
from dynamicrafter_tpu.sampling.ddim import SamplerSettings, ddim_sample
from dynamicrafter_tpu.sampling.dpm import dpm_sample
from dynamicrafter_tpu.sampling.unipc import unipc_sample

from test_dpm import _err, _gaussian_model_fn, tiny_cfg_sampler  # noqa: F401


def _run(sampler, model_fn, x_T, schedule, steps, discretize, param,
         order=2, corrector=True):
    table = sched_lib.build_ddim_table(
        schedule, num_steps=steps, discretize=discretize, eta=0.0)
    st = SamplerSettings(steps=steps, discretize=discretize, eta=0.0,
                         parameterization=param, solver_order=order,
                         use_corrector=corrector)
    fn = {"dpm": dpm_sample, "ddim": ddim_sample,
          "unipc": unipc_sample}[sampler]
    return fn(model_fn, x_T, schedule, table, st)


def _oracle(param, ztsnr):
    schedule = sched_lib.build_schedule(
        timesteps=1000, linear_start=0.00085, linear_end=0.012,
        parameterization=param, rescale_betas_zero_snr=ztsnr)
    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    x_T = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    return schedule, _gaussian_model_fn(schedule, mu, 0.5, param), x_T


@pytest.mark.parametrize("param,ztsnr,discretize", [
    ("eps", False, "uniform"),
    ("v", True, "uniform_trailing"),
])
def test_order1_nocorrector_is_ddim(param, ztsnr, discretize):
    """The exactness anchor: exponential Adams at order 1 == DDIM eta=0."""
    schedule, model_fn, x_T = _oracle(param, ztsnr)
    for steps in (20, 50):
        a = _run("unipc", model_fn, x_T, schedule, steps, discretize, param,
                 order=1, corrector=False)
        b = _run("ddim", model_fn, x_T, schedule, steps, discretize, param)
        assert _err(a, b) < 2e-6, (param, steps, _err(a, b))


def test_gaussian_third_order_eps_regime():
    """Clean-grid regime: UniPC-3 shows genuinely higher order than
    DPM++(2M). Measured: dpm 2.57e-2/7.39e-3/2.35e-3 at 40/80/160 vs
    unipc3 1.67e-2/3.49e-3/9.56e-4 (ratios 4.79x, 3.65x)."""
    schedule, model_fn, x_T = _oracle("eps", False)
    ref = _run("dpm", model_fn, x_T, schedule, 500, "uniform", "eps")
    e = {}
    for s in (40, 80, 160):
        e[("u3", s)] = _err(_run("unipc", model_fn, x_T, schedule, s,
                                 "uniform", "eps", order=3), ref)
        e[("dpm", s)] = _err(_run("dpm", model_fn, x_T, schedule, s,
                                  "uniform", "eps"), ref)
    for s in (40, 80, 160):
        assert e[("u3", s)] < 0.8 * e[("dpm", s)], e
    assert 3.2 < e[("u3", 40)] / e[("u3", 80)] < 9.0, e
    assert 2.8 < e[("u3", 80)] / e[("u3", 160)] < 9.0, e


def test_gaussian_low_step_edge_shipped_regime():
    """v/ZTSNR/trailing (the 512/1024-config regime): the default
    order=2+corrector beats DPM++(2M) at low step counts (measured
    0.86x at 10, 0.91x at 16) and always beats DDIM (0.49x/0.39x)."""
    schedule, model_fn, x_T = _oracle("v", True)
    ref = _run("dpm", model_fn, x_T, schedule, 500, "uniform_trailing", "v")
    for s in (10, 16):
        eu = _err(_run("unipc", model_fn, x_T, schedule, s,
                       "uniform_trailing", "v"), ref)
        ed = _err(_run("dpm", model_fn, x_T, schedule, s,
                       "uniform_trailing", "v"), ref)
        ei = _err(_run("ddim", model_fn, x_T, schedule, s,
                       "uniform_trailing", "v"), ref)
        assert eu < 0.98 * ed, (s, eu, ed)
        assert eu < 0.6 * ei, (s, eu, ei)


@pytest.mark.slow
def test_unipc_tiny_unet_full_config(tiny_cfg_sampler):  # noqa: F811
    """Measured (CPU, the test_dpm fixture setup, vs its ddim-200 ref):
    unipc2@20=0.0505 dpm@20=0.0531 ddim@20=0.0851; unipc@120=0.0060."""
    from dynamicrafter_tpu.sampling.ddim import CFGConditioning  # noqa: F401

    # reuse the fixture's ddim/dpm runner for the baselines, then run
    # unipc through the same conditioning by rebuilding its closure
    run = tiny_cfg_sampler
    ref = run("ddim", 200)
    e_u120 = _err(run("unipc", 120), ref)
    assert e_u120 < 0.015, e_u120          # same-trajectory regression
    e_u20 = _err(run("unipc", 20), ref)
    e_dpm20 = _err(run("dpm", 20), ref)
    e_ddim20 = _err(run("ddim", 20), ref)
    assert e_u20 < e_dpm20, (e_u20, e_dpm20)
    assert e_u20 < 0.65 * e_ddim20, (e_u20, e_ddim20)


def test_unipc_rejects_deepcache_and_eps_ztsnr():
    schedule = sched_lib.build_schedule(timesteps=1000)
    table = sched_lib.build_ddim_table(schedule, num_steps=10,
                                       discretize="uniform", eta=0.0)
    with pytest.raises(ValueError, match="deepcache"):
        unipc_sample(lambda x, t: x, jnp.zeros((1, 4)), schedule, table,
                     SamplerSettings(steps=10, deepcache=5))
    zt = sched_lib.build_schedule(timesteps=1000, parameterization="eps",
                                  rescale_betas_zero_snr=True)
    zt_table = sched_lib.build_ddim_table(zt, num_steps=10,
                                          discretize="uniform_trailing",
                                          eta=0.0)
    with pytest.raises(ValueError, match="zero-terminal-SNR"):
        unipc_sample(lambda x, t: x, jnp.zeros((1, 4)), zt, zt_table,
                     SamplerSettings(steps=10, parameterization="eps"))
