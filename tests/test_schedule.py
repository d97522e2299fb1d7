"""Parity tests for schedule math vs the reference torch implementation."""
import numpy as np
import pytest

from dynamicrafter_tpu import schedule as S

torch = pytest.importorskip("torch")

from conftest import requires_reference  # noqa: E402


@requires_reference
class TestVsReference:
    def setup_method(self):
        from lvdm.models import utils_diffusion as ref

        self.ref = ref

    @pytest.mark.parametrize("sched", ["linear", "cosine", "sqrt_linear", "sqrt"])
    def test_beta_schedules(self, sched):
        ours = S.make_beta_schedule(sched, 1000, 0.00085, 0.012)
        theirs = self.ref.make_beta_schedule(sched, 1000, 0.00085, 0.012)
        np.testing.assert_allclose(ours, theirs, rtol=1e-12)

    def test_ztsnr(self):
        betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
        ours = S.rescale_zero_terminal_snr(betas)
        theirs = self.ref.rescale_zero_terminal_snr(betas.copy())
        np.testing.assert_allclose(ours, theirs, rtol=1e-10)
        # terminal SNR must be exactly zero
        assert np.isclose(np.cumprod(1 - ours)[-1], 0.0, atol=1e-12)

    @pytest.mark.parametrize("method", ["uniform", "uniform_trailing", "quad"])
    @pytest.mark.parametrize("steps", [50, 25, 10])
    def test_ddim_timesteps(self, method, steps):
        ours = S.make_ddim_timesteps(method, steps, 1000)
        theirs = self.ref.make_ddim_timesteps(method, steps, 1000, verbose=False)
        np.testing.assert_array_equal(ours, theirs)

    @pytest.mark.parametrize("eta", [0.0, 1.0])
    def test_ddim_sampling_parameters(self, eta):
        betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
        acum = np.cumprod(1 - betas)
        ts = S.make_ddim_timesteps("uniform", 50, 1000)
        s_o, a_o, ap_o = S.make_ddim_sampling_parameters(acum, ts, eta)
        s_r, a_r, ap_r = self.ref.make_ddim_sampling_parameters(
            torch.tensor(acum), ts, eta, verbose=False
        )
        np.testing.assert_allclose(s_o, np.asarray(s_r), rtol=1e-10)
        np.testing.assert_allclose(a_o, np.asarray(a_r), rtol=1e-12)
        np.testing.assert_allclose(ap_o, np.asarray(ap_r), rtol=1e-12)

    def test_timestep_embedding(self):
        t = np.array([0, 1, 57, 999], dtype=np.int64)
        ours = np.asarray(S.timestep_embedding(np.asarray(t), 320))
        theirs = self.ref.timestep_embedding(torch.tensor(t), 320).numpy()
        # residual is torch's fp32 freq rounding; ours uses float64 freqs
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_rescale_noise_cfg(self):
        rng = np.random.default_rng(0)
        cfg = rng.standard_normal((2, 4, 3, 8, 8)).astype(np.float32)
        txt = rng.standard_normal((2, 4, 3, 8, 8)).astype(np.float32)
        ours = np.asarray(S.rescale_noise_cfg(cfg, txt, 0.7))
        theirs = self.ref.rescale_noise_cfg(
            torch.tensor(cfg), torch.tensor(txt), 0.7
        ).numpy()
        # torch std uses Bessel correction (unbiased); ours must match
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-5)


class TestScheduleTables:
    def test_build_schedule_basic(self):
        sched = S.build_schedule(
            timesteps=1000, linear_start=0.00085, linear_end=0.012,
            parameterization="v", rescale_betas_zero_snr=True,
            use_dynamic_rescale=True, base_scale=0.7, turning_step=400,
        )
        assert sched.num_timesteps == 1000
        assert float(sched.alphas_cumprod[-1]) == pytest.approx(0.0, abs=1e-10)
        assert not np.any(np.isnan(np.asarray(sched.lvlb_weights)))
        assert sched.scale_arr.shape == (1400,)
        assert float(sched.scale_arr[0]) == 1.0
        assert float(sched.scale_arr[-1]) == pytest.approx(0.7)

    def test_q_sample_identity_at_t0(self):
        sched = S.build_schedule(timesteps=1000, linear_start=0.00085, linear_end=0.012)
        x = np.ones((2, 3, 4, 4, 4), np.float32)
        noise = np.zeros_like(x)
        t = np.zeros((2,), np.int32)
        out = np.asarray(sched.q_sample(x, t, noise))
        np.testing.assert_allclose(out, x * float(sched.sqrt_alphas_cumprod[0]), rtol=1e-6)

    def test_v_roundtrip(self):
        # eps recovered via predict_eps_from_z_and_v(q_sample(x,eps), get_v(x,eps))
        rng = np.random.default_rng(1)
        sched = S.build_schedule(timesteps=1000, linear_start=0.00085, linear_end=0.012)
        x = rng.standard_normal((2, 4, 4)).astype(np.float32)
        eps = rng.standard_normal((2, 4, 4)).astype(np.float32)
        t = np.array([13, 789], np.int32)
        z = sched.q_sample(x, t, eps)
        v = sched.get_v(x, eps, t)
        eps2 = np.asarray(sched.predict_eps_from_z_and_v(z, t, v))
        x2 = np.asarray(sched.predict_start_from_z_and_v(z, t, v))
        np.testing.assert_allclose(eps2, eps, atol=1e-5)
        np.testing.assert_allclose(x2, x, atol=1e-5)

    def test_ddim_table(self):
        sched = S.build_schedule(timesteps=1000, linear_start=0.00085, linear_end=0.012,
                                 use_dynamic_rescale=True)
        tab = S.build_ddim_table(sched, num_steps=50, discretize="uniform_trailing", eta=0.0)
        assert tab.num_steps == 50
        assert int(tab.timesteps[-1]) == 999
        assert np.all(np.asarray(tab.sigmas) == 0.0)
        assert tab.scale_arr is not None
        assert float(tab.scale_arr_prev[0]) == float(tab.scale_arr[0])
