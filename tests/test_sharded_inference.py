"""Multi-device inference: pipeline.sample under a (dp, sp) mesh must run
and match the single-device result."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-device sampler compiles

import jax

from dynamicrafter_tpu.config import ModelConfig
from dynamicrafter_tpu.parallel.sharding import create_mesh
from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline
from tiny_config import TINY_MODEL_CONFIG


@pytest.fixture(scope="module")
def pipes():
    cfg = ModelConfig(TINY_MODEL_CONFIG)
    single = DynamiCrafterPipeline(cfg)
    single.init_random(seed=0, latent_hw=(8, 8))
    mesh = create_mesh(dp=2, sp=4)
    sharded = DynamiCrafterPipeline(cfg, params=single.params, mesh=mesh)
    return single, sharded


def test_sharded_matches_single(pipes):
    single, sharded = pipes
    vids = np.random.default_rng(0).uniform(
        -1, 1, (1, 4, 16, 16, 3)).astype(np.float32)
    kw = dict(steps=2, cfg_scale=2.0, timestep_spacing="uniform_trailing",
              seed=5, decode=False)
    z1 = single.sample(["a boat"], vids, **kw)
    z2 = sharded.sample(["a boat"], vids, **kw)
    assert z1.shape == z2.shape
    np.testing.assert_allclose(z1, z2, atol=2e-4, rtol=0)


@pytest.mark.parametrize("sampler", ["dpm", "unipc"])
def test_sharded_ode_sampler_matches_single(pipes, sampler):
    """The DPM++(2M)/UniPC scans (elementwise updates around the same
    sharded UNet call) must also be device-count-invariant."""
    single, sharded = pipes
    vids = np.random.default_rng(1).uniform(
        -1, 1, (1, 4, 16, 16, 3)).astype(np.float32)
    kw = dict(steps=3, cfg_scale=2.0, timestep_spacing="uniform_trailing",
              seed=6, decode=False, sampler=sampler, eta=0.0)
    z1 = single.sample(["a boat"], vids, **kw)
    z2 = sharded.sample(["a boat"], vids, **kw)
    assert z1.shape == z2.shape
    np.testing.assert_allclose(z1, z2, atol=2e-4, rtol=0)
