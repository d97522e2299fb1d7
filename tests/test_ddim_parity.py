"""End-to-end DDIM sampling parity vs the reference sampler.

The reference DDIMSampler only needs a handful of model attributes; we wrap
the tiny torch UNet in a minimal harness exposing exactly the schedule math
of lvdm/models/ddpm3d.py (register_schedule / predict_*_from_z_and_v) and the
hybrid DiffusionWrapper conditioning (ddpm3d.py:1254-1258). The sampler's
CUDA-forcing register_buffer is patched to run on CPU.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import requires_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynamicrafter_tpu import schedule as S  # noqa: E402
from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel  # noqa: E402
from dynamicrafter_tpu.sampling.ddim import (  # noqa: E402
    CFGConditioning, SamplerSettings, ddim_sample, make_cfg_denoiser,
)
from dynamicrafter_tpu.utils import weights as W  # noqa: E402
from test_unet_parity import TINY, randomize_  # noqa: E402


def _extract(a, t, shape):
    out = a.gather(-1, t)
    return out.reshape(t.shape[0], *((1,) * (len(shape) - 1)))


class FakeLDM:
    """Minimal stand-in for LatentDiffusion as seen by the reference sampler."""

    def __init__(self, unet, sched: S.DiffusionSchedule, parameterization="eps",
                 use_dynamic_rescale=False):
        self.unet = unet
        self.device = torch.device("cpu")
        self.parameterization = parameterization
        self.use_dynamic_rescale = use_dynamic_rescale
        self.num_timesteps = sched.num_timesteps
        tt = lambda x: torch.tensor(np.asarray(x), dtype=torch.float32)
        self.betas = tt(sched.betas)
        self.alphas_cumprod = tt(sched.alphas_cumprod)
        self.alphas_cumprod_prev = tt(sched.alphas_cumprod_prev)
        self.sqrt_alphas_cumprod = tt(sched.sqrt_alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = tt(sched.sqrt_one_minus_alphas_cumprod)
        if sched.scale_arr is not None:
            self.scale_arr = tt(sched.scale_arr)

    def apply_model(self, x, t, cond, **kw):
        xc = torch.cat([x] + cond["c_concat"], dim=1) if "c_concat" in cond else x
        cc = torch.cat(cond["c_crossattn"], 1)
        return self.unet(xc, t, context=cc, fs=kw.get("fs"))

    def predict_eps_from_z_and_v(self, x_t, t, v):
        return (_extract(self.sqrt_alphas_cumprod, t, x_t.shape) * v
                + _extract(self.sqrt_one_minus_alphas_cumprod, t, x_t.shape) * x_t)

    def predict_start_from_z_and_v(self, x_t, t, v):
        return (_extract(self.sqrt_alphas_cumprod, t, x_t.shape) * x_t
                - _extract(self.sqrt_one_minus_alphas_cumprod, t, x_t.shape) * v)


def _patch_register_buffer(sampler_cls, monkeypatch):
    monkeypatch.setattr(sampler_cls, "register_buffer",
                        lambda self, name, attr: setattr(self, name, attr))


def _build(seed=0, parameterization="eps", ztsnr=False, dynamic=False):
    cfg_kw = dict(TINY)
    ref_unet_cls = __import__(
        "lvdm.modules.networks.openaimodel3d", fromlist=["UNetModel"]).UNetModel
    unet = randomize_(ref_unet_cls(**cfg_kw).eval(), seed=seed)
    sched = S.build_schedule(
        timesteps=1000, linear_start=0.00085, linear_end=0.012,
        parameterization=parameterization, rescale_betas_zero_snr=ztsnr,
        use_dynamic_rescale=dynamic, base_scale=0.7, turning_step=400,
    )
    params = W.convert_unet({k: v.numpy() for k, v in unet.state_dict().items()})
    jax_unet = UNetModel(UNetConfig.from_dict(cfg_kw))
    return cfg_kw, unet, sched, params, jax_unet


def _make_conds(rng, b, t, ctx_dim, lat):
    ctx_c = rng.standard_normal((b, 77 + t * 16, ctx_dim)).astype(np.float32)
    ctx_u = rng.standard_normal((b, 77 + t * 16, ctx_dim)).astype(np.float32)
    concat = rng.standard_normal(lat).astype(np.float32)
    return ctx_c, ctx_u, concat


def _jax_cond(ctxs, concat, t, ctx_dim, fs):
    """Stack reference-layout contexts into CFGConditioning (uncond first)."""
    p = len(ctxs)
    b = ctxs[0].shape[0]
    text = np.stack([c[:, :77] for c in ctxs])
    img = np.stack([c[:, 77:].reshape(b, t, 16, ctx_dim) for c in ctxs])
    cc = np.transpose(concat, (0, 2, 3, 4, 1))  # b c t h w -> b t h w c
    cc = np.broadcast_to(cc, (p, *cc.shape))
    return CFGConditioning(
        context_text=jnp.asarray(text), context_img=jnp.asarray(img),
        concat=jnp.asarray(cc), fs=None if fs is None else jnp.asarray(fs),
    )


@requires_reference
@pytest.mark.parametrize(
    "parameterization,ztsnr,dynamic,spacing,eta,guidance_rescale",
    [
        ("eps", False, False, "uniform", 0.0, 0.0),
        ("v", True, True, "uniform_trailing", 0.0, 0.7),
        ("v", False, False, "uniform", 1.0, 0.0),
    ],
)
def test_ddim_parity(monkeypatch, parameterization, ztsnr, dynamic, spacing,
                     eta, guidance_rescale):
    from lvdm.models.samplers.ddim import DDIMSampler

    _patch_register_buffer(DDIMSampler, monkeypatch)
    cfg_kw, unet, sched, params, jax_unet = _build(
        0, parameterization, ztsnr, dynamic)
    b, t, h, w = 1, cfg_kw["temporal_length"], 8, 8
    ctx_dim = cfg_kw["context_dim"]
    steps, cfg_scale = 4, 2.0

    rng = np.random.default_rng(5)
    x_T = rng.standard_normal((b, 4, t, h, w)).astype(np.float32)
    ctx_c, ctx_u, concat = _make_conds(rng, b, t, ctx_dim, (b, 4, t, h, w))
    fs = np.array([3] * b, dtype=np.int64)

    fake = FakeLDM(unet, sched, parameterization, dynamic)
    sampler = DDIMSampler(fake)
    cond = {"c_crossattn": [torch.tensor(ctx_c)], "c_concat": [torch.tensor(concat)]}
    uc = {"c_crossattn": [torch.tensor(ctx_u)], "c_concat": [torch.tensor(concat)]}

    # pre-draw the per-step eta noise with the same generator state the
    # reference will consume (one randn per step, ddim.py:273)
    torch.manual_seed(99)
    noises = np.stack([
        torch.randn(b, 4, t, h, w).numpy() for _ in range(steps)
    ]) if eta > 0 else None

    torch.manual_seed(99)
    with torch.no_grad():
        samples, _ = sampler.sample(
            S=steps, batch_size=b, shape=(4, t, h, w),
            conditioning=cond, x_T=torch.tensor(x_T), eta=eta, verbose=False,
            unconditional_guidance_scale=cfg_scale,
            unconditional_conditioning=uc,
            fs=torch.tensor(fs), timestep_spacing=spacing,
            guidance_rescale=guidance_rescale, schedule_verbose=False,
        )
    out_ref = samples.numpy()

    # --- ours ---
    table = S.build_ddim_table(sched, num_steps=steps, discretize=spacing, eta=eta)
    settings = SamplerSettings(
        steps=steps, discretize=spacing, eta=eta, cfg_scale=cfg_scale,
        guidance_rescale=guidance_rescale, parameterization=parameterization,
    )
    cfg_cond = _jax_cond([ctx_u, ctx_c], concat, t, ctx_dim, fs)

    def unet_apply(p, x, ts, context_text, context_img, fs):
        return jax_unet.apply({"params": p}, x, ts, context_text=context_text,
                              context_img=context_img, fs=fs)

    model_fn = make_cfg_denoiser(unet_apply, params, cfg_cond, settings)
    x_T_j = jnp.asarray(np.transpose(x_T, (0, 2, 3, 4, 1)))
    noise_j = None if noises is None else jnp.asarray(
        np.transpose(noises, (0, 1, 3, 4, 5, 2)))
    out = jax.jit(
        lambda xt: ddim_sample(model_fn, xt, sched, table, settings, noise=noise_j)
    )(x_T_j)
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))

    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, atol=5e-3, rtol=0)
    assert np.median(np.abs(out - out_ref)) < 5e-4


@requires_reference
def test_ddim_multicond_parity(monkeypatch):
    from lvdm.models.samplers.ddim_multiplecond import DDIMSampler as MCSampler

    _patch_register_buffer(MCSampler, monkeypatch)
    cfg_kw, unet, sched, params, jax_unet = _build(1, "eps", False, False)
    b, t, h, w = 1, cfg_kw["temporal_length"], 8, 8
    ctx_dim = cfg_kw["context_dim"]
    steps, cfg_scale, cfg_img = 4, 2.0, 1.5

    rng = np.random.default_rng(6)
    x_T = rng.standard_normal((b, 4, t, h, w)).astype(np.float32)
    ctx_c, ctx_u, concat = _make_conds(rng, b, t, ctx_dim, (b, 4, t, h, w))
    ctx_u2 = rng.standard_normal((b, 77 + t * 16, ctx_dim)).astype(np.float32)
    fs = np.array([3] * b, dtype=np.int64)

    fake = FakeLDM(unet, sched, "eps", False)
    sampler = MCSampler(fake)
    cond = {"c_crossattn": [torch.tensor(ctx_c)], "c_concat": [torch.tensor(concat)]}
    uc = {"c_crossattn": [torch.tensor(ctx_u)], "c_concat": [torch.tensor(concat)]}
    uc2 = {"c_crossattn": [torch.tensor(ctx_u2)], "c_concat": [torch.tensor(concat)]}

    with torch.no_grad():
        samples, _ = sampler.sample(
            S=steps, batch_size=b, shape=(4, t, h, w),
            conditioning=cond, x_T=torch.tensor(x_T), eta=0.0, verbose=False,
            unconditional_guidance_scale=cfg_scale, cfg_img=cfg_img,
            unconditional_conditioning=uc,
            unconditional_conditioning_img_nonetext=uc2,
            fs=torch.tensor(fs), timestep_spacing="uniform",
            schedule_verbose=False,
        )
    out_ref = samples.numpy()

    table = S.build_ddim_table(sched, num_steps=steps, discretize="uniform", eta=0.0)
    settings = SamplerSettings(steps=steps, cfg_scale=cfg_scale, cfg_img=cfg_img,
                               parameterization="eps")
    cfg_cond = _jax_cond([ctx_u, ctx_u2, ctx_c], concat, t, ctx_dim, fs)

    def unet_apply(p, x, ts, context_text, context_img, fs):
        return jax_unet.apply({"params": p}, x, ts, context_text=context_text,
                              context_img=context_img, fs=fs)

    model_fn = make_cfg_denoiser(unet_apply, params, cfg_cond, settings)
    x_T_j = jnp.asarray(np.transpose(x_T, (0, 2, 3, 4, 1)))
    out = jax.jit(
        lambda xt: ddim_sample(model_fn, xt, sched, table, settings)
    )(x_T_j)
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, out_ref, atol=5e-3, rtol=0)
    assert np.median(np.abs(out - out_ref)) < 5e-4


@requires_reference
def test_ddim_mask_blend_clean_cond_parity(monkeypatch):
    """Inpaint-style mask/x0 latent blending (ddim.py:173-180), clean_cond
    variant (deterministic: blends the clean x0, no in-loop q_sample RNG)."""
    from lvdm.models.samplers.ddim import DDIMSampler

    _patch_register_buffer(DDIMSampler, monkeypatch)
    cfg_kw, unet, sched, params, jax_unet = _build(2, "eps", False, False)
    b, t, h, w = 1, cfg_kw["temporal_length"], 8, 8
    ctx_dim = cfg_kw["context_dim"]
    steps, cfg_scale = 4, 2.0

    rng = np.random.default_rng(11)
    x_T = rng.standard_normal((b, 4, t, h, w)).astype(np.float32)
    ctx_c, ctx_u, concat = _make_conds(rng, b, t, ctx_dim, (b, 4, t, h, w))
    fs = np.array([3] * b, dtype=np.int64)
    x0 = rng.standard_normal((b, 4, t, h, w)).astype(np.float32)
    # keep the first frame's latent fixed, generate the rest
    mask = np.zeros((b, 4, t, h, w), np.float32)
    mask[:, :, 0] = 1.0

    fake = FakeLDM(unet, sched, "eps", False)
    sampler = DDIMSampler(fake)
    cond = {"c_crossattn": [torch.tensor(ctx_c)], "c_concat": [torch.tensor(concat)]}
    uc = {"c_crossattn": [torch.tensor(ctx_u)], "c_concat": [torch.tensor(concat)]}

    with torch.no_grad():
        samples, _ = sampler.sample(
            S=steps, batch_size=b, shape=(4, t, h, w),
            conditioning=cond, x_T=torch.tensor(x_T), eta=0.0, verbose=False,
            unconditional_guidance_scale=cfg_scale,
            unconditional_conditioning=uc,
            mask=torch.tensor(mask), x0=torch.tensor(x0),
            fs=torch.tensor(fs), timestep_spacing="uniform",
            clean_cond=True, schedule_verbose=False,
        )
    out_ref = samples.numpy()

    table = S.build_ddim_table(sched, num_steps=steps, discretize="uniform",
                               eta=0.0)
    settings = SamplerSettings(steps=steps, cfg_scale=cfg_scale,
                               parameterization="eps", clean_cond=True)
    cfg_cond = _jax_cond([ctx_u, ctx_c], concat, t, ctx_dim, fs)

    def unet_apply(p, x, ts, context_text, context_img, fs):
        return jax_unet.apply({"params": p}, x, ts, context_text=context_text,
                              context_img=context_img, fs=fs)

    model_fn = make_cfg_denoiser(unet_apply, params, cfg_cond, settings)
    tr = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 4, 1)))
    out = jax.jit(
        lambda xt: ddim_sample(model_fn, xt, sched, table, settings,
                               mask=tr(mask), x0=tr(x0))
    )(tr(x_T))
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, out_ref, atol=5e-3, rtol=0)
    assert np.median(np.abs(out - out_ref)) < 5e-4
