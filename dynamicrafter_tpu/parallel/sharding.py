"""SPMD mesh + sharding utilities.

The reference scales only by data parallelism over NCCL
(scripts/evaluation/ddp_wrapper.py:8-13, main/utils_train.py:125-136). The
TPU design instead uses a 2-axis logical mesh:

  * DATA_AXIS ('dp')  — batch axis (training batches; CFG passes at inference)
  * SEQ_AXIS  ('sp')  — the frame axis T in spatial stages, resharded to the
                        HW axis in temporal stages (XLA inserts the
                        all-to-alls at the annotated transposes over ICI).

All model code calls `constrain(x, ...)` which is a no-op unless a mesh has
been activated with `use_mesh`, so single-device paths are untouched.
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
SEQ_AXIS = "sp"

_state = threading.local()


def create_mesh(
    dp: int = 1,
    sp: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, sp) mesh. sp=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if sp == -1:
        assert n % dp == 0, f"{n} devices not divisible by dp={dp}"
        sp = n // dp
    assert dp * sp == n, f"mesh {dp}x{sp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def active_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    prev = active_mesh()
    _state.mesh = mesh
    try:
        if mesh is not None:
            with jax.set_mesh(mesh):
                yield mesh
        else:
            yield None
    finally:
        _state.mesh = prev


def zero_spec(shape, mesh: Mesh, axis: str = DATA_AXIS) -> P:
    """ZeRO-style partition spec: shard the largest dimension divisible by
    the dp axis; scalars / indivisible leaves stay replicated.

    The reference's default training strategy is DDPSharded (fairscale
    ZeRO-2: gradients + optimizer state sharded over data-parallel ranks,
    main/utils_train.py:126-128, README.md:358). The XLA equivalent: give
    the AdamW moments (and EMA shadow) this sharding and the SPMD
    partitioner turns the gradient all-reduce into reduce-scatter + the
    update into a per-shard computation.
    """
    n = mesh.shape[axis]
    spec = [None] * len(shape)
    if n > 1 and shape:
        # largest shardable dim wins; ties -> earliest
        cands = [(d, i) for i, d in enumerate(shape) if d % n == 0 and d >= n]
        if cands:
            _, best = max(cands, key=lambda t: (t[0], -t[1]))
            spec[best] = axis
    return P(*spec)


def zero_shardings(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Matching pytree of NamedShardings for ZeRO sharding over `axis`."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, zero_spec(getattr(x, "shape", ()),
                                                mesh, axis)), tree)


def sharded_over(leaf, axis: str = DATA_AXIS) -> bool:
    """True if an array's sharding partitions some dimension over `axis`."""
    sh = getattr(leaf, "sharding", None)
    spec = getattr(sh, "spec", None)
    if spec is None:
        return False
    for entry in spec:
        if entry == axis or (isinstance(entry, tuple) and axis in entry):
            return True
    return False


def constrain_zero(tree, axis: str = DATA_AXIS):
    """with_sharding_constraint the whole tree to its ZeRO shardings
    (no-op without an active mesh)."""
    mesh = active_mesh()
    if mesh is None or mesh.shape.get(axis, 1) == 1:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, zero_spec(getattr(x, "shape", ()),
                                             mesh, axis))), tree)


def constrain(x: jax.Array, *spec) -> jax.Array:
    """Apply a sharding constraint if a mesh is active; else identity.

    Axes named in `spec` that don't divide the corresponding dimension are
    dropped (replicated) to keep odd shapes working.
    """
    mesh = active_mesh()
    if mesh is None:
        return x
    fixed = []
    for dim, ax in zip(x.shape, spec):
        if ax is None:
            fixed.append(None)
        else:
            axes = (ax,) if isinstance(ax, str) else tuple(ax)
            size = int(np.prod([mesh.shape[a] for a in axes]))
            fixed.append(ax if dim % size == 0 else None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*fixed)))
