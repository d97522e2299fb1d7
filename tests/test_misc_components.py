"""Smaller component tests: img2img decode, video grid writer,
IdentityFirstStage, tokenizer structure."""
import os

import numpy as np

import jax.numpy as jnp

from dynamicrafter_tpu import schedule as S
from dynamicrafter_tpu.models.vae import IdentityFirstStage
from dynamicrafter_tpu.sampling.ddim import (
    SamplerSettings, ddim_decode, stochastic_encode,
)
from dynamicrafter_tpu.utils.tokenizer import HashTokenizer
from dynamicrafter_tpu.utils.video import save_video_grid, to_uint8


def test_stochastic_encode_and_ddim_decode():
    sched = S.build_schedule(timesteps=1000, linear_start=0.00085,
                             linear_end=0.012)
    table = S.build_ddim_table(sched, num_steps=4, discretize="uniform_trailing")
    x0 = jnp.ones((1, 2, 4, 4, 4)) * 0.3
    noise = jnp.zeros_like(x0)
    t_idx = jnp.asarray([2])
    z = stochastic_encode(sched, table, x0, t_idx, noise)
    # zero-noise encode = sqrt(alpha)*x0
    expected = float(jnp.sqrt(table.alphas[2])) * 0.3
    np.testing.assert_allclose(np.asarray(z)[0, 0, 0, 0, 0], expected,
                               rtol=1e-5)

    # identity model output (eps = 0) should walk z back toward x0-scale
    settings = SamplerSettings(steps=4, parameterization="eps", cfg_scale=1.0)
    out = ddim_decode(lambda x, t: jnp.zeros_like(x), z, sched, table,
                      settings, t_start=3)
    assert out.shape == z.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_identity_first_stage():
    m = IdentityFirstStage()
    x = jnp.ones((1, 4, 4, 3))
    moments = m.encode_moments(x)
    assert moments.shape == (1, 4, 4, 6)
    np.testing.assert_array_equal(np.asarray(m.decode(x)), np.asarray(x))


def test_save_video_grid(tmp_path):
    vids = np.random.default_rng(0).uniform(-1, 1, (3, 4, 16, 16, 3)) \
        .astype(np.float32)
    path = str(tmp_path / "grid.mp4")
    save_video_grid(vids, path, fps=4)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_to_uint8_range():
    x = np.array([-1.0, 0.0, 1.0], np.float32).reshape(1, 1, 3)
    out = to_uint8(x)
    assert out.tolist() == [[[0, 128, 255]]]


def test_groupnorm_large_mean_offset():
    """Shifted-moment variance must survive |mean| >> std (the naive
    E[x^2]-E[x]^2 form loses all significant bits of var in fp32 here)."""
    import jax

    from dynamicrafter_tpu.ops.norms import GroupNorm

    rng = np.random.default_rng(0)
    # mean ~ 512, std ~ 0.05: naive fp32 one-pass variance is pure noise
    x = (512.0 + 0.05 * rng.standard_normal((2, 4, 4, 64))).astype(np.float32)
    gn = GroupNorm(num_groups=8, num_batch_axes=1)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(gn.apply(params, jnp.asarray(x)))

    xr = x.astype(np.float64).reshape(2, 4, 4, 8, 8)
    mean = xr.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xr - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    ref = ((xr - mean) / np.sqrt(var + 1e-5)).reshape(x.shape)
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-2)


def test_hash_tokenizer_structure():
    tok = HashTokenizer()
    out = tok(["hello world", ""])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot
    assert out[0, 3] == tok.eot  # sot + 2 words + eot
    assert out[1, 1] == tok.eot
    # deterministic
    np.testing.assert_array_equal(out, tok(["hello world", ""]))


def test_compile_cache_populates_and_hits(tmp_path):
    """utils/compile_cache.enable: a jitted graph serializes into the cache
    dir and a FRESH PROCESS with the same graph loads it instead of
    recompiling (serving cold-start elimination; measured on the real TPU
    in docs/SERVING.md)."""
    import subprocess
    import sys

    prog = """
import sys, jax, jax.numpy as jnp
from dynamicrafter_tpu.utils.compile_cache import enable
enable(sys.argv[1])
import logging
rec = []
h = logging.Handler()
h.emit = lambda r: rec.append(r.getMessage())
logging.getLogger("jax._src.compiler").addHandler(h)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
out = jax.jit(lambda x: jnp.tanh(x @ x).sum())(jnp.ones((64, 64)))
assert out.shape == ()
print("HIT" if any("Persistent compilation cache hit" in m for m in rec)
      else "MISS")
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cache = tmp_path / "xla_cache"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r1 = subprocess.run([sys.executable, "-c", prog, str(cache)],
                        capture_output=True, text=True, env=env, cwd=repo,
                        timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "MISS" in r1.stdout
    assert any(cache.iterdir()), "cache dir not populated"
    r2 = subprocess.run([sys.executable, "-c", prog, str(cache)],
                        capture_output=True, text=True, env=env, cwd=repo,
                        timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "HIT" in r2.stdout
