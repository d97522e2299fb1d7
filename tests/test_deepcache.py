"""DeepCache cached sampling (opt-in acceleration, no reference counterpart).

The seam decomposition must be EXACT: a shallow forward fed the cache from a
full forward at the same (x, t) is bit-identical to the full forward. The
approximation enters only when a cache is reused across adjacent DDIM steps
(Ma et al., CVPR'24), which is exercised as an e2e smoke.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # module-scoped UNet compile dominates

from dynamicrafter_tpu import schedule as sched_lib
from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
from dynamicrafter_tpu.sampling.ddim import (
    CFGConditioning,
    SamplerSettings,
    ddim_sample,
    make_cfg_denoiser,
)

CFG = UNetConfig(in_channels=8, out_channels=4, model_channels=32,
                 attention_resolutions=(2, 1), num_res_blocks=1,
                 channel_mult=(1, 2), num_head_channels=16,
                 context_dim=48, temporal_length=4, fs_condition=True)


@pytest.fixture(scope="module")
def unet():
    m = UNetModel(CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 8)), jnp.float32)
    ts = jnp.array([10, 500])
    ctx_t = jnp.asarray(rng.standard_normal((2, 7, 48)), jnp.float32)
    ctx_i = jnp.asarray(rng.standard_normal((2, 4, 5, 48)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, ts, ctx_t, ctx_i)
    # Perturb EVERY param: the checkpoint convention zero-inits gating convs
    # (incl. the final out_conv), so a fresh init outputs exactly zero and
    # any parity check would be vacuous. Random offsets make every layer —
    # including the deep levels — contribute to the output.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [l + jnp.asarray(0.05 * rng.standard_normal(l.shape), l.dtype)
              for l in leaves]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return m, params, (x, ts, ctx_t, ctx_i)


def test_shallow_forward_with_fresh_cache_is_exact(unet):
    m, params, (x, ts, ctx_t, ctx_i) = unet
    full = m.apply(params, x, ts, ctx_t, ctx_i)
    full2, cache = m.apply(params, x, ts, ctx_t, ctx_i, return_cache=True)
    assert jnp.array_equal(full, full2)
    # cache = deep feature at ds1 resolution with level-1 channel count
    assert cache.shape == (2, 4, 8, 8, 64)
    shallow = m.apply(params, x, ts, ctx_t, ctx_i, cache=cache)
    assert jnp.array_equal(shallow, full)


def test_cache_actually_short_circuits_deep_levels(unet):
    m, params, (x, ts, ctx_t, ctx_i) = unet
    _, cache = m.apply(params, x, ts, ctx_t, ctx_i, return_cache=True)
    out_ref = m.apply(params, x, ts, ctx_t, ctx_i, cache=cache)
    # zero every deep-level and middle-block param: the shallow forward must
    # not change (it never touches them), while the full forward must.
    def zero_deep(path, a):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        deep = ("middle_block" in keys
                or any(f"input_blocks_{i}_" in keys for i in (2, 3))
                or any(f"output_blocks_{i}_" in keys for i in (0, 1)))
        return jnp.zeros_like(a) if deep else a

    zeroed = jax.tree_util.tree_map_with_path(zero_deep, params)
    out_zeroed = m.apply(zeroed, x, ts, ctx_t, ctx_i, cache=cache)
    assert jnp.array_equal(out_ref, out_zeroed)
    full_zeroed = m.apply(zeroed, x, ts, ctx_t, ctx_i)
    assert not jnp.array_equal(full_zeroed, out_ref)


def _sampler_fixture(unet, rng_seed=1):
    m, params, (x, ts, ctx_t, ctx_i) = unet
    rng = np.random.default_rng(rng_seed)
    schedule = sched_lib.build_schedule(
        timesteps=1000, linear_start=0.00085, linear_end=0.012,
        parameterization="v", rescale_betas_zero_snr=True,
        use_dynamic_rescale=True, base_scale=0.7)
    table = sched_lib.build_ddim_table(schedule, num_steps=10,
                                       discretize="uniform_trailing", eta=0.0)
    cond = CFGConditioning(
        context_text=jnp.stack([ctx_t * 0, ctx_t]),
        context_img=jnp.stack([ctx_i * 0, ctx_i]),
        concat=jnp.asarray(rng.standard_normal((2, 2, 4, 8, 8, 4)),
                           jnp.float32),
        fs=jnp.array([3, 3], jnp.int32))
    x_T = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 4)), jnp.float32)
    unet_apply = lambda p, xx, tt, **kw: m.apply(p, xx, tt, **kw)
    return params, schedule, table, cond, x_T, unet_apply


@pytest.mark.parametrize("sequential", [False, True])
def test_deepcache_sampling(unet, sequential):
    params, schedule, table, cond, x_T, unet_apply = _sampler_fixture(unet)

    def run(deepcache):
        st = SamplerSettings(steps=10, cfg_scale=7.5, guidance_rescale=0.7,
                             sequential_cfg=sequential, deepcache=deepcache)
        fn = make_cfg_denoiser(unet_apply, params, cond, st)
        return ddim_sample(fn, x_T, schedule, table, st)

    base = run(1)
    dc = run(5)
    assert bool(jnp.all(jnp.isfinite(dc)))
    # same scale, different values: an approximation, not a reimplementation
    rel = float(jnp.linalg.norm(dc - base) / jnp.linalg.norm(base))
    assert 0.0 < rel < 1.0


def test_deepcache_must_divide_steps(unet):
    params, schedule, table, cond, x_T, unet_apply = _sampler_fixture(unet)
    st = SamplerSettings(steps=10, deepcache=3)
    fn = make_cfg_denoiser(unet_apply, params, cond, st)
    with pytest.raises(ValueError, match="must divide"):
        ddim_sample(fn, x_T, schedule, table, st)
