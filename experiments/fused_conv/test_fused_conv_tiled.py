"""Row-tiled fused GN+SiLU+conv kernel vs the unfused XLA path (interpret)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fused_conv_tiled import fused_gn_silu_conv_tiled
from dynamicrafter_tpu.ops.norms import GroupNorm


@pytest.mark.parametrize("emb", [False, True])
def test_tiled_matches_reference(emb):
    rng = np.random.default_rng(0)
    n, h, w, c = 2, 8, 14, 64
    x = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    gs = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2 + 1)
    gb = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.2)
    e = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32)) if emb \
        else None

    xx = x if e is None else x + e[:, None, None, :]
    gn = GroupNorm(32, epsilon=1e-5, num_batch_axes=1)
    a = jax.nn.silu(gn.apply({"params": {"scale": gs, "bias": gb}}, xx))
    ref = jax.lax.conv_general_dilated(
        a, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    out = fused_gn_silu_conv_tiled(x, k, b, gs, gb, e, tile_h=4,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
