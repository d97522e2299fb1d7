"""End-to-end pipeline smoke tests on a tiny random-init model (CPU)."""
import numpy as np
import pytest

from conftest import requires_reference  # noqa: F401

from dynamicrafter_tpu.config import ModelConfig
from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline
from tiny_config import TINY_MODEL_CONFIG


@pytest.fixture(scope="module")
def pipe():
    cfg = ModelConfig(TINY_MODEL_CONFIG)
    p = DynamiCrafterPipeline(cfg)
    p.init_random(seed=0, latent_hw=(8, 8))
    return p


def _videos(b=1, t=4, hw=16):
    rng = np.random.default_rng(0)
    return rng.uniform(-1, 1, (b, t, hw, hw, 3)).astype(np.float32)


def test_sample_standard_cfg(pipe):
    out = pipe.sample(
        ["a cat playing piano"], _videos(), steps=3, cfg_scale=2.0,
        eta=0.0, timestep_spacing="uniform_trailing", guidance_rescale=0.7,
        fs=[3], seed=42,
    )
    assert out.videos.shape == (1, 1, 4, 16, 16, 3)
    assert np.all(np.isfinite(out.videos))


@pytest.mark.slow
def test_sample_deterministic_given_seed(pipe):
    kw = dict(steps=2, cfg_scale=1.5, eta=1.0,
              timestep_spacing="uniform_trailing", seed=7)
    a = pipe.sample(["x"], _videos(), **kw).videos
    b = pipe.sample(["x"], _videos(), **kw).videos
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_sample_multicond(pipe):
    out = pipe.sample(
        ["a dog"], _videos(), steps=2, cfg_scale=2.0, cfg_img=1.5,
        multiple_cond_cfg=True, eta=0.0, timestep_spacing="uniform_trailing",
        seed=1,
    )
    assert out.videos.shape == (1, 1, 4, 16, 16, 3)
    assert np.all(np.isfinite(out.videos))


@pytest.mark.slow
def test_sample_interp_mode(pipe):
    out = pipe.sample(
        ["loop"], _videos(), steps=2, cfg_scale=2.0, eta=0.0,
        timestep_spacing="uniform_trailing", loop_or_interp=True, seed=2,
    )
    assert np.all(np.isfinite(out.videos))


@pytest.mark.slow
def test_latents_only_and_decode(pipe):
    z = pipe.sample(["x"], _videos(), steps=2, cfg_scale=1.0,
                    timestep_spacing="uniform_trailing", seed=3, decode=False)
    assert z.shape == (1, 1, 4, 8, 8, 4)
    frames = pipe.decode_latents(z[:, 0], perframe=True)
    assert frames.shape == (1, 4, 16, 16, 3)


def test_no_cfg_single_pass(pipe):
    out = pipe.sample(["x"], _videos(), steps=2, cfg_scale=1.0,
                      timestep_spacing="uniform_trailing", seed=4)
    assert np.all(np.isfinite(out.videos))


@pytest.mark.slow
def test_sample_with_latent_mask(pipe):
    """Inpaint-style conditioning: masked latents held at x0."""
    import jax

    vids = _videos()
    z0 = pipe.sample(["x"], vids, steps=2, cfg_scale=1.0,
                     timestep_spacing="uniform_trailing", seed=3,
                     decode=False)[:, 0]
    mask = np.zeros_like(np.asarray(z0))
    mask[:, 0] = 1.0  # pin first frame
    out = pipe.sample(["x"], vids, steps=2, cfg_scale=1.5,
                      timestep_spacing="uniform_trailing", seed=4,
                      decode=False, mask=mask, x0_latents=np.asarray(z0))
    assert out.shape[2:] == (4, 8, 8, 4)
    assert np.all(np.isfinite(out))


@pytest.mark.parametrize("sampler", ["dpm", "unipc"])
def test_sample_ode_samplers(pipe, sampler):
    """sampler='dpm'/'unipc' runs end-to-end and, at matched many-step
    counts, lands near the DDIM (eta=0) trajectory — same ODE."""
    kw = dict(steps=12, cfg_scale=2.0, eta=0.0,
              timestep_spacing="uniform_trailing", seed=42, decode=False)
    z_ode = pipe.sample(["x"], _videos(), sampler=sampler, **kw)
    z_ddim = pipe.sample(["x"], _videos(), sampler="ddim", **kw)
    assert z_ode.shape == z_ddim.shape
    assert np.all(np.isfinite(z_ode))
    rel = (np.linalg.norm(z_ode - z_ddim) / np.linalg.norm(z_ddim))
    assert rel < 0.25, rel        # same ODE, different discretization
    assert rel > 1e-6, rel        # but not the identical code path


def test_sample_dpm_rejects_ddim_only_features(pipe):
    with pytest.raises(ValueError, match="log_every_t"):
        pipe.sample(["x"], _videos(), steps=2, sampler="dpm", log_every_t=1,
                    decode=False)
    with pytest.raises(ValueError, match="deepcache"):
        pipe.sample(["x"], _videos(), steps=4, sampler="dpm", deepcache=2,
                    decode=False)
    with pytest.raises(ValueError, match="unknown sampler"):
        pipe.sample(["x"], _videos(), steps=2, sampler="plms", decode=False)
