"""parallel/sharding helper behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicrafter_tpu.parallel.sharding import (
    DATA_AXIS, SEQ_AXIS, active_mesh, constrain, create_mesh, use_mesh,
)


def test_create_mesh_shapes():
    mesh = create_mesh(dp=2, sp=4)
    assert mesh.shape == {"dp": 2, "sp": 4}
    mesh2 = create_mesh(dp=1, sp=-1)
    assert mesh2.shape == {"dp": 1, "sp": 8}
    with pytest.raises(AssertionError):
        create_mesh(dp=3, sp=-1)  # 8 % 3 != 0


def test_constrain_noop_without_mesh():
    x = jnp.ones((4, 4))
    assert active_mesh() is None
    y = constrain(x, DATA_AXIS, SEQ_AXIS)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_constrain_drops_nondivisible_axes():
    mesh = create_mesh(dp=2, sp=4)

    @jax.jit
    def f(x):
        # dim0=3 not divisible by dp=2 -> replicated; dim1=8 divisible by sp
        return constrain(x, DATA_AXIS, SEQ_AXIS)

    with use_mesh(mesh):
        out = f(jnp.ones((3, 8)))
    np.testing.assert_array_equal(np.asarray(out), np.ones((3, 8)))


def test_use_mesh_restores_state():
    mesh = create_mesh(dp=1, sp=8)
    with use_mesh(mesh) as m:
        assert active_mesh() is mesh and m is mesh
    assert active_mesh() is None
    with use_mesh(None):
        assert active_mesh() is None
