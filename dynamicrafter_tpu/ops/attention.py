"""Attention primitives.

Single entry point `dot_product_attention` with pluggable backends:
  * "xla"    — einsum with fp32 softmax; reference semantics, runs anywhere.
  * "flash"  — Pallas TPU flash-attention kernel (ops/flash_attention.py),
               fp32 accumulation, O(L) memory. Used for large spatial
               self-attention (up to 72*128 = 9216 tokens at 1024-res).
  * "auto"   — flash on TPU when shapes qualify, else xla.

Shapes follow the (batch..., length, heads, head_dim) convention so leading
batch axes (e.g. the (B, T) of spatial attention or (B, HW) of temporal
attention) never need flattening — sharding constraints stay attached.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = "auto"  # module default, overridable per call


def set_default_backend(name: str) -> None:
    global _BACKEND
    assert name in ("auto", "xla", "flash")
    _BACKEND = name


def _shard_mapped_qkv(kernel, mesh, q, seq_axis: int, n_dims: int):
    """Wrap a (q, k, v) -> out Pallas kernel in shard_map for the sp mesh.

    SEQ_AXIS carries dimension `seq_axis`; the batch dim rides DATA_AXIS
    when it divides the dp extent (single shared spec for q/k/v/out —
    callers broadcast K/V to q's leading shape first).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dynamicrafter_tpu.parallel.sharding import DATA_AXIS, SEQ_AXIS

    dims = [None] * n_dims
    dp = max(mesh.shape.get(DATA_AXIS, 1), 1)
    dims[0] = DATA_AXIS if q.shape[0] % dp == 0 else None
    dims[seq_axis] = SEQ_AXIS
    spec = P(*dims)
    return shard_map(kernel, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)


def _seq_mesh(axis_size: int):
    """The active mesh if its 'sp' axis is >1 and divides axis_size.

    Pallas custom calls are OPAQUE to GSPMD: without an explicit
    shard_map, a sharded operand would be all-gathered around the kernel
    (involuntary replication — the exact failure mode the collective-plan
    test forbids). Kernel calls below therefore run under shard_map when
    an sp mesh is active, so each device executes the kernel on its local
    shard — the same per-shard shapes the docs/DESIGN.md projection
    measures."""
    from dynamicrafter_tpu.parallel.sharding import SEQ_AXIS, active_mesh

    mesh = active_mesh()
    if mesh is None:
        return None
    sp = mesh.shape.get(SEQ_AXIS, 1)
    if sp <= 1 or axis_size % sp != 0:
        return None
    return mesh


def _use_flash(q, k, mask, backend: str) -> bool:
    if backend == "xla":
        return False
    if mask is not None:
        return False  # causal temporal masks are tiny (T<=16); xla path is fine
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    if backend == "flash":
        return True
    if not on_tpu or k.shape[-3] < 512:
        return False
    # Device-profiled on v5e (bf16, d=64, transpose-free layout): flash
    # wins at L=2560/5h (4.0 vs 17.8 ms) and L=2304/10h (3.6 vs 7.1 ms),
    # is mandatory at L=9216 (XLA OOMs); XLA wins at L=640/10h (1.15 vs
    # 1.52 ms).
    lq = q.shape[-3]
    return lq >= 2048


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Reference-semantics attention: fp32 logits + softmax.

    q: (..., Lq, H, D); k, v: (..., Lk, H, D). k/v may have fewer leading
    batch dims than q (broadcast) — e.g. text context shared across frames.
    mask: broadcastable to (..., H, Lq, Lk); positions where mask==False are
    masked out (reference lvdm/modules/attention.py:111-115).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # Logits dtype follows the input: bf16 inputs keep bf16 logits (fp32 MXU
    # accumulation, rounded on store) — the reference's fp16-autocast einsum
    # behaves the same (attention.py:103 under amp) and it halves the
    # logits-matrix HBM traffic, which dominates mid-resolution attention.
    # The softmax itself still computes in fp32 (XLA fuses the upcast).
    logit_dtype = q.dtype if q.dtype != jnp.float64 else jnp.float32
    sim = jnp.einsum("...qhd,...khd->...hqk", q, k,
                     preferred_element_type=logit_dtype) * scale
    if mask is not None:
        neg = jnp.finfo(sim.dtype).max
        sim = jnp.where(mask, sim, -neg)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("...hqk,...khd->...qhd", attn, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _use_small_t(q, k, v, mask, backend: str) -> bool:
    """Packed small-T kernel: temporal self-attention (T<=32, no mask).
    Packs 128//T positions per MXU tile — the XLA path wastes 8x lane
    occupancy at T=16 on thousands of tiny (T, T) matmuls."""
    if backend == "xla" or mask is not None:
        return False
    if q.shape != k.shape or q.shape != v.shape:
        return False  # self-attention only
    t = q.shape[-3]
    if t > 32 or 128 % t != 0 or q.ndim < 4:
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    if not on_tpu and backend != "flash":
        return False
    # only worth it with many positions per head
    g = 1
    for s in q.shape[:-3]:
        g *= s
    return g >= 256


def attention_axis1(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    backend: Optional[str] = None,
) -> jax.Array:
    """Self-attention over the axis-1 tokens of (B, L, G, H, D) — the
    UNet's spatial-major temporal layout, consumed without any transpose.

    On TPU with a small T this hits the time-major packed Pallas kernel
    (ops/small_attention.py); otherwise the operands take one moveaxis
    round-trip through the standard tokens-at--2 path (fallback only:
    CPU/parity runs and the rare masked variants)."""
    backend = backend or _BACKEND
    t = q.shape[1]
    eligible = (backend != "xla" and mask is None
                and q.shape == k.shape == v.shape
                and q.ndim == 5 and t <= 32 and 128 % t == 0)
    if eligible:
        try:
            on_tpu = jax.default_backend() == "tpu"
        except RuntimeError:
            on_tpu = False
        if on_tpu or backend == "flash":
            from dynamicrafter_tpu.ops.small_attention import (
                small_t_attention_tmajor,
            )

            mesh = _seq_mesh(q.shape[2])
            if mesh is not None:
                fn = _shard_mapped_qkv(
                    lambda a, b_, c: small_t_attention_tmajor(
                        a, b_, c, scale=scale),
                    mesh, q, seq_axis=2, n_dims=5)
                return fn(q, k, v)
            return small_t_attention_tmajor(q, k, v, scale=scale)
    mv = lambda x: jnp.moveaxis(x, 1, -3)
    out = dot_product_attention(mv(q), mv(k), mv(v), mask=mask, scale=scale,
                                backend=backend)
    return jnp.moveaxis(out, -3, 1)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    backend: Optional[str] = None,
) -> jax.Array:
    backend = backend or _BACKEND
    if _use_small_t(q, k, v, mask, backend):
        from dynamicrafter_tpu.ops.small_attention import small_t_attention

        return small_t_attention(q, k, v, scale=scale)
    # Shared context (e.g. text K/V common to all frames): insert size-1 axes
    # before (L, H, D); einsum broadcasts without materializing the tile.
    while k.ndim < q.ndim:
        k = jnp.expand_dims(k, -4)
        v = jnp.expand_dims(v, -4)
    if _use_flash(q, k, mask, backend):
        from dynamicrafter_tpu.ops.flash_attention import flash_attention

        k = jnp.broadcast_to(k, q.shape[:-3] + k.shape[-3:])
        v = jnp.broadcast_to(v, q.shape[:-3] + v.shape[-3:])
        mesh = _seq_mesh(q.shape[1]) if q.ndim == 5 else None
        if mesh is not None:
            # spatial attention under the sp mesh: T (axis 1) is sharded;
            # run the kernel per-shard (see _seq_mesh)
            fn = _shard_mapped_qkv(
                lambda a, b_, c: flash_attention(a, b_, c, scale=scale),
                mesh, q, seq_axis=1, n_dims=5)
            return fn(q, k, v)
        return flash_attention(q, k, v, scale=scale)
    return xla_attention(q, k, v, mask=mask, scale=scale)
