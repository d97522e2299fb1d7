"""Ancestral (DDPM) p_sample_loop + intermediates parity vs the reference.

The oracle is the REAL reference code: lvdm.models.ddpm3d's
p_sample_loop/p_sample/p_mean_variance/q_posterior bound onto a minimal
harness object (ddpm3d imports pytorch_lightning + torchvision which are not
installed — both are stubbed with just enough surface for the import; the
sampling methods under test never touch them).

Also pins the DDIM sampler's log_every_t intermediates (x_inter / pred_x0,
ddim.py:157,199-201) against the reference DDIMSampler's returned dict.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import requires_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynamicrafter_tpu import schedule as S  # noqa: E402
from dynamicrafter_tpu.sampling.ancestral import p_sample_loop  # noqa: E402
from test_unet_parity import TINY, randomize_  # noqa: E402


def _import_ddpm3d():
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        util = types.ModuleType("pytorch_lightning.utilities")
        util.rank_zero_only = lambda fn: fn
        pl.utilities = util
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = util
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")

        def _stub_make_grid(*a, **k):
            raise RuntimeError("torchvision stub: make_grid not available")

        tvu.make_grid = _stub_make_grid
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    import lvdm.models.ddpm3d as ddpm3d
    return ddpm3d


@requires_reference
class TestAncestralParity:
    @classmethod
    def setup_class(cls):
        cls.ddpm3d = _import_ddpm3d()

    def _oracle(self, unet, sched, parameterization="eps",
                clip_denoised=False):
        ddpm3d = self.ddpm3d

        class AncestralOracle:
            # the reference's own sampling methods, bound unmodified
            p_sample_loop = ddpm3d.LatentDiffusion.p_sample_loop
            p_sample = ddpm3d.LatentDiffusion.p_sample
            p_mean_variance = ddpm3d.LatentDiffusion.p_mean_variance
            q_posterior = ddpm3d.DDPM.q_posterior
            q_sample = ddpm3d.DDPM.q_sample
            predict_start_from_noise = ddpm3d.DDPM.predict_start_from_noise

            def apply_model(self, x, t, cond, **kw):
                xc = torch.cat([x] + cond["c_concat"], dim=1) \
                    if "c_concat" in cond else x
                cc = torch.cat(cond["c_crossattn"], 1)
                return self.unet(xc, t, context=cc, fs=kw.get("fs"))

        o = AncestralOracle()
        o.unet = unet
        o.parameterization = parameterization
        o.clip_denoised = clip_denoised
        o.shorten_cond_schedule = False
        o.num_timesteps = sched.num_timesteps
        o.log_every_t = 100
        tt = lambda x: torch.tensor(np.asarray(x), dtype=torch.float32)
        o.betas = tt(sched.betas)
        o.sqrt_alphas_cumprod = tt(sched.sqrt_alphas_cumprod)
        o.sqrt_one_minus_alphas_cumprod = tt(
            sched.sqrt_one_minus_alphas_cumprod)
        o.sqrt_recip_alphas_cumprod = tt(sched.sqrt_recip_alphas_cumprod)
        o.sqrt_recipm1_alphas_cumprod = tt(sched.sqrt_recipm1_alphas_cumprod)
        o.posterior_variance = tt(sched.posterior_variance)
        o.posterior_log_variance_clipped = tt(
            sched.posterior_log_variance_clipped)
        o.posterior_mean_coef1 = tt(sched.posterior_mean_coef1)
        o.posterior_mean_coef2 = tt(sched.posterior_mean_coef2)
        return o

    def _build(self, seed=0, timesteps=24):
        from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

        from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
        from dynamicrafter_tpu.utils import weights as W

        cfg_kw = dict(TINY)
        unet = randomize_(RefUNet(**cfg_kw).eval(), seed=seed)
        sched = S.build_schedule(timesteps=timesteps, linear_start=0.00085,
                                 linear_end=0.012, parameterization="eps")
        params = W.convert_unet(
            {k: v.numpy() for k, v in unet.state_dict().items()})
        jax_unet = UNetModel(UNetConfig.from_dict(cfg_kw))
        return cfg_kw, unet, sched, params, jax_unet

    def _model_fn(self, jax_unet, params, ctx, concat, t_frames, ctx_dim, fs):
        """No-CFG conditioned denoiser in our channels-last layout."""
        text = jnp.asarray(ctx[:, :77])
        img = jnp.asarray(
            ctx[:, 77:].reshape(ctx.shape[0], t_frames, 16, ctx_dim))
        cc = jnp.asarray(np.transpose(concat, (0, 2, 3, 4, 1)))
        fs_j = jnp.asarray(fs)

        def model_fn(x, ts):
            xc = jnp.concatenate([x, cc], axis=-1)
            return jax_unet.apply({"params": params}, xc, ts,
                                  context_text=text, context_img=img, fs=fs_j)

        return model_fn

    @pytest.mark.parametrize("clip_denoised,use_mask", [(False, False),
                                                        (True, True)])
    def test_p_sample_loop_parity(self, clip_denoised, use_mask):
        cfg_kw, unet, sched, params, jax_unet = self._build()
        b, t, h, w = 1, cfg_kw["temporal_length"], 8, 8
        ctx_dim = cfg_kw["context_dim"]
        T = sched.num_timesteps
        log_every_t = 7

        rng = np.random.default_rng(3)
        x_T = rng.standard_normal((b, 4, t, h, w)).astype(np.float32)
        ctx = rng.standard_normal((b, 77 + t * 16, ctx_dim)).astype(np.float32)
        concat = rng.standard_normal((b, 4, t, h, w)).astype(np.float32)
        fs = np.array([3] * b, dtype=np.int64)
        x0 = mask = None
        if use_mask:
            x0 = rng.standard_normal((b, 4, t, h, w)).astype(np.float32)
            mask = np.zeros((b, 4, t, h, w), np.float32)
            mask[:, :, 0] = 1.0

        # pre-draw per-step noise in the reference's consumption order:
        # one randn in p_sample (noise_like), then one in the mask q_sample
        torch.manual_seed(17)
        noises, mask_noises = [], []
        for _ in range(T):
            noises.append(torch.randn(b, 4, t, h, w).numpy())
            if use_mask:
                mask_noises.append(torch.randn(b, 4, t, h, w).numpy())

        oracle = self._oracle(unet, sched, "eps", clip_denoised)
        cond = {"c_crossattn": [torch.tensor(ctx)],
                "c_concat": [torch.tensor(concat)]}
        torch.manual_seed(17)
        with torch.no_grad():
            out_ref, inter_ref = oracle.p_sample_loop(
                cond, (b, 4, t, h, w), return_intermediates=True,
                x_T=torch.tensor(x_T), verbose=False,
                log_every_t=log_every_t, fs=torch.tensor(fs),
                mask=None if mask is None else torch.tensor(mask),
                x0=None if x0 is None else torch.tensor(x0))
        inter_ref = np.stack([i.numpy() for i in inter_ref])

        model_fn = self._model_fn(jax_unet, params, ctx, concat, t, ctx_dim,
                                  fs)
        tr = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 4, 1)))
        tr_steps = lambda a: jnp.asarray(
            np.transpose(np.stack(a), (0, 1, 3, 4, 5, 2)))
        out, inter = jax.jit(
            lambda xt: p_sample_loop(
                model_fn, xt, sched, parameterization="eps",
                clip_denoised=clip_denoised, log_every_t=log_every_t,
                noise=tr_steps(noises),
                mask=None if mask is None else tr(mask),
                x0=None if x0 is None else tr(x0),
                mask_noise=None if not use_mask else tr_steps(mask_noises),
                return_intermediates=True)
        )(tr(x_T))
        out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
        inter = np.transpose(np.asarray(inter), (0, 1, 5, 2, 3, 4))

        assert inter.shape == inter_ref.shape
        np.testing.assert_allclose(out, out_ref.numpy(), atol=5e-3, rtol=0)
        np.testing.assert_allclose(inter, inter_ref, atol=5e-3, rtol=0)
        assert np.median(np.abs(inter - inter_ref)) < 5e-4


@requires_reference
def test_ddim_log_every_t_intermediates_parity(monkeypatch):
    """x_inter / pred_x0 intermediates vs the reference DDIMSampler
    (ddim.py:157,199-201), log_every_t=2 over 5 steps (irregular saves:
    index 4 [first], 4%2, 2, 0)."""
    from lvdm.models.samplers.ddim import DDIMSampler

    from dynamicrafter_tpu.sampling.ddim import (
        SamplerSettings, ddim_sample, make_cfg_denoiser,
    )
    from test_ddim_parity import (
        FakeLDM, _build, _jax_cond, _make_conds, _patch_register_buffer,
    )

    _patch_register_buffer(DDIMSampler, monkeypatch)
    cfg_kw, unet, sched, params, jax_unet = _build(0, "eps", False, False)
    b, t, h, w = 1, cfg_kw["temporal_length"], 8, 8
    ctx_dim = cfg_kw["context_dim"]
    steps, cfg_scale, log_every_t = 5, 2.0, 2

    rng = np.random.default_rng(9)
    x_T = rng.standard_normal((b, 4, t, h, w)).astype(np.float32)
    ctx_c, ctx_u, concat = _make_conds(rng, b, t, ctx_dim, (b, 4, t, h, w))
    fs = np.array([3] * b, dtype=np.int64)

    fake = FakeLDM(unet, sched, "eps", False)
    sampler = DDIMSampler(fake)
    with torch.no_grad():
        samples, inter_ref = sampler.sample(
            S=steps, batch_size=b, shape=(4, t, h, w),
            conditioning={"c_crossattn": [torch.tensor(ctx_c)],
                          "c_concat": [torch.tensor(concat)]},
            x_T=torch.tensor(x_T), eta=0.0, verbose=False,
            unconditional_guidance_scale=cfg_scale,
            unconditional_conditioning={
                "c_crossattn": [torch.tensor(ctx_u)],
                "c_concat": [torch.tensor(concat)]},
            fs=torch.tensor(fs), timestep_spacing="uniform",
            log_every_t=log_every_t, schedule_verbose=False)
    x_inter_ref = np.stack([i.numpy() for i in inter_ref["x_inter"]])
    pred_x0_ref = np.stack([i.numpy() for i in inter_ref["pred_x0"]])

    table = S.build_ddim_table(sched, num_steps=steps, discretize="uniform",
                               eta=0.0)
    settings = SamplerSettings(steps=steps, cfg_scale=cfg_scale,
                               parameterization="eps")
    cfg_cond = _jax_cond([ctx_u, ctx_c], concat, t, ctx_dim, fs)

    def unet_apply(p, x, ts, context_text, context_img, fs):
        return jax_unet.apply({"params": p}, x, ts, context_text=context_text,
                              context_img=context_img, fs=fs)

    model_fn = make_cfg_denoiser(unet_apply, params, cfg_cond, settings)
    out, inter = jax.jit(
        lambda xt: ddim_sample(model_fn, xt, sched, table, settings,
                               log_every_t=log_every_t)
    )(jnp.asarray(np.transpose(x_T, (0, 2, 3, 4, 1))))

    back = lambda a: np.transpose(np.asarray(a), (0, 1, 5, 2, 3, 4))
    x_inter, pred_x0 = back(inter["x_inter"]), back(inter["pred_x0"])
    assert x_inter.shape == x_inter_ref.shape
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), samples.numpy(),
        atol=5e-3, rtol=0)
    np.testing.assert_allclose(x_inter, x_inter_ref, atol=5e-3, rtol=0)
    np.testing.assert_allclose(pred_x0, pred_x0_ref, atol=5e-3, rtol=0)
