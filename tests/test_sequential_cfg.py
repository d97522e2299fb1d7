"""Sequential-CFG mode must produce identical results to batched CFG."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two full sampler compiles

from dynamicrafter_tpu.config import ModelConfig
from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline
from tiny_config import TINY_MODEL_CONFIG


@pytest.fixture(scope="module")
def pipe():
    p = DynamiCrafterPipeline(ModelConfig(TINY_MODEL_CONFIG))
    p.init_random(seed=0, latent_hw=(8, 8))
    return p


@pytest.mark.parametrize("multicond", [False, True])
def test_sequential_matches_batched(pipe, multicond):
    vids = np.random.default_rng(0).uniform(
        -1, 1, (1, 4, 16, 16, 3)).astype(np.float32)
    kw = dict(steps=2, cfg_scale=2.0, timestep_spacing="uniform_trailing",
              seed=9, decode=False)
    if multicond:
        kw.update(multiple_cond_cfg=True, cfg_img=1.3)
    a = pipe.sample(["a fox"], vids, sequential_cfg=False, **kw)
    b = pipe.sample(["a fox"], vids, sequential_cfg=True, **kw)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)
