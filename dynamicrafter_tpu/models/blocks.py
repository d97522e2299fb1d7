"""UNet building blocks, redesigned channels-last / 5D for TPU.

Layout convention: activations are (B, T, H, W, C) end to end. Spatial ops
treat (B, T) as batch; temporal ops transpose to (B, H*W, T, C). There is no
(b t) folding as in the reference (lvdm/modules/networks/openaimodel3d.py:566)
— keeping the axes separate lets pjit shard T ('sp') in spatial stages and
HW in temporal stages with XLA inserting the all-to-alls.

Behavioral parity targets:
  * CrossAttention (dual text/image KV)  lvdm/modules/attention.py:42-209
  * BasicTransformerBlock                lvdm/modules/attention.py:212-246
  * SpatialTransformer                   lvdm/modules/attention.py:249-310
  * TemporalTransformer                  lvdm/modules/attention.py:313-412
  * GEGLU / FeedForward                  lvdm/modules/attention.py:415-442
  * ResBlock / TemporalConvBlock         lvdm/modules/networks/openaimodel3d.py:109-279
  * Up/Downsample                        lvdm/modules/networks/openaimodel3d.py:51-106
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynamicrafter_tpu.ops.attention import dot_product_attention
from dynamicrafter_tpu.ops.norms import GroupNorm
from dynamicrafter_tpu.parallel.sharding import (
    DATA_AXIS, SEQ_AXIS, active_mesh, constrain,
)


def _seq_sharded() -> bool:
    """True when tracing under a mesh whose 'sp' axis is >1."""
    mesh = active_mesh()
    return mesh is not None and mesh.shape.get(SEQ_AXIS, 1) > 1

Context = Optional[Tuple[Optional[jax.Array], Optional[jax.Array]]]
# (text_context (B, Lt, Cc), image_context (B, T, Li, Cc) or None)


def silu(x):
    return jax.nn.silu(x)


def gelu_exact(x):
    # torch F.gelu default is the exact erf formulation
    return jax.nn.gelu(x, approximate=False)


class RelativePosition(nn.Module):
    """Learned relative-position embedding table (attention.py:20-39)."""

    num_units: int
    max_relative_position: int

    @nn.compact
    def __call__(self, length_q: int, length_k: int) -> jax.Array:
        table = self.param(
            "embeddings_table",
            nn.initializers.xavier_uniform(),
            (self.max_relative_position * 2 + 1, self.num_units),
        )
        rq = jnp.arange(length_q)[:, None]
        rk = jnp.arange(length_k)[None, :]
        dist = jnp.clip(rk - rq, -self.max_relative_position, self.max_relative_position)
        return table[dist + self.max_relative_position]


class CrossAttention(nn.Module):
    """Self- or cross-attention with an optional dual image-KV branch.

    Queries x: (B, G, L, C) where G is a grouping axis ((B,T) spatial frames
    or (B,HW) temporal columns). Self-attention when context is None.
    Cross-attention context is the (text, image) pair; the image branch uses
    separate to_k_ip/to_v_ip projections and its output is added with a fixed
    or learnable scale (attention.py:89-94, 129-142).
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    relative_position: bool = False
    temporal_length: Optional[int] = None
    image_cross_attention: bool = False
    image_cross_attention_scale: float = 1.0
    image_cross_attention_scale_learnable: bool = False
    # tokens live at axis 1 of a (B, T, G, C) input (the UNet's native
    # spatial-major layout) instead of axis -2 — the transpose-free
    # temporal path. Self-attention only; same params either way.
    tokens_axis1: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Context = None,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        ctx_dim = self.context_dim or self.query_dim
        dense = lambda name, feats, d: nn.Dense(
            feats, use_bias=False, name=name,
            dtype=x.dtype, param_dtype=jnp.float32,
        )(d)

        q = dense("to_q", inner, x)
        split = lambda t: t.reshape(*t.shape[:-1], self.heads, self.dim_head)
        q = split(q)

        if self.tokens_axis1:
            assert context is None and not self.relative_position
            from dynamicrafter_tpu.ops.attention import attention_axis1

            k = split(dense("to_k", inner, x))
            v = split(dense("to_v", inner, x))
            out = attention_axis1(q, k, v, mask=mask)
            out = out.reshape(*out.shape[:-2], inner)
        elif context is None:
            k = split(dense("to_k", inner, x))
            v = split(dense("to_v", inner, x))
            if self.relative_position:
                # small-T path only (temporal attention); fp32 logits
                assert self.temporal_length is not None
                lq, lk = q.shape[-3], k.shape[-3]
                k2 = RelativePosition(self.dim_head, self.temporal_length,
                                      name="relative_position_k")(lq, lk)
                v2 = RelativePosition(self.dim_head, self.temporal_length,
                                      name="relative_position_v")(lq, lk)
                scale = self.dim_head ** -0.5
                sim = jnp.einsum("...qhd,...khd->...hqk", q, k) * scale
                sim = sim + jnp.einsum("...qhd,qkd->...hqk", q, k2) * scale
                if mask is not None:
                    sim = jnp.where(mask, sim, -jnp.finfo(sim.dtype).max)
                attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
                out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
                out = out + jnp.einsum("...hqk,qkd->...qhd", attn, v2)
            else:
                out = dot_product_attention(q, k, v, mask=mask)
            out = out.reshape(*out.shape[:-2], inner)
        else:
            text_ctx, img_ctx = context
            k = split(dense("to_k", inner, text_ctx))
            v = split(dense("to_v", inner, text_ctx))
            out = dot_product_attention(q, k, v, mask=mask)
            out = out.reshape(*out.shape[:-2], inner)
            if self.image_cross_attention and img_ctx is not None:
                k_ip = split(dense("to_k_ip", inner, img_ctx))
                v_ip = split(dense("to_v_ip", inner, img_ctx))
                out_ip = dot_product_attention(q, k_ip, v_ip)
                out_ip = out_ip.reshape(*out_ip.shape[:-2], inner)
                scale = self.image_cross_attention_scale
                if self.image_cross_attention_scale_learnable:
                    alpha = self.param("alpha", nn.initializers.zeros, ())
                    out = out + scale * out_ip * (jnp.tanh(alpha) + 1.0)
                else:
                    out = out + scale * out_ip

        out = nn.Dense(self.query_dim, name="to_out",
                       dtype=x.dtype, param_dtype=jnp.float32)(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class FeedForward(nn.Module):
    """(GE)GLU MLP (attention.py:415-442)."""

    dim: int
    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        inner = int(self.dim * self.mult)
        if self.glu:
            proj = nn.Dense(inner * 2, name="proj_in",
                            dtype=x.dtype, param_dtype=jnp.float32)(x)
            h, gate = jnp.split(proj, 2, axis=-1)
            h = h * gelu_exact(gate)
        else:
            h = nn.Dense(inner, name="proj_in",
                         dtype=x.dtype, param_dtype=jnp.float32)(x)
            h = gelu_exact(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim_out or self.dim, name="proj_out",
                        dtype=x.dtype, param_dtype=jnp.float32)(h)


class BasicTransformerBlock(nn.Module):
    """Pre-LN self-attn -> cross-attn -> FF with residuals (attention.py:212-246)."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    dropout: float = 0.0
    relative_position: bool = False
    temporal_length: Optional[int] = None
    image_cross_attention: bool = False
    image_cross_attention_scale: float = 1.0
    image_cross_attention_scale_learnable: bool = False
    tokens_axis1: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Context = None,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name,
                                       dtype=jnp.float32, param_dtype=jnp.float32)
        attn_kw = dict(
            heads=self.n_heads, dim_head=self.d_head, dropout=self.dropout,
            relative_position=self.relative_position,
            temporal_length=self.temporal_length,
            tokens_axis1=self.tokens_axis1,
        )
        h = ln("norm1")(x).astype(x.dtype)
        x = CrossAttention(query_dim=self.dim, name="attn1", **attn_kw)(
            h, context=None, mask=mask, deterministic=deterministic) + x
        h = ln("norm2")(x).astype(x.dtype)
        x = CrossAttention(
            query_dim=self.dim, context_dim=self.context_dim, name="attn2",
            image_cross_attention=self.image_cross_attention,
            image_cross_attention_scale=self.image_cross_attention_scale,
            image_cross_attention_scale_learnable=self.image_cross_attention_scale_learnable,
            **attn_kw,
        )(h, context=context, mask=mask, deterministic=deterministic) + x
        h = ln("norm3")(x).astype(x.dtype)
        x = FeedForward(self.dim, dropout=self.dropout, glu=True, name="ff")(
            h, deterministic=deterministic) + x
        return x


class SpatialTransformer(nn.Module):
    """Per-frame transformer over HW tokens (attention.py:249-310).

    Input (B, T, H, W, C). proj_in/out are Dense on channels-last — identical
    math to the reference's 1x1 conv when use_linear=False; the weight
    converter normalizes both layouts.
    """

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    context_dim: Optional[int] = None
    image_cross_attention: bool = False
    image_cross_attention_scale_learnable: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Context = None, deterministic: bool = True
    ) -> jax.Array:
        b, t, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = GroupNorm(32, epsilon=1e-6, num_batch_axes=2, name="norm")(x)
        x = x.reshape(b, t, h * w, c)
        x = nn.Dense(inner, name="proj_in", dtype=x.dtype, param_dtype=jnp.float32)(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner, n_heads=self.n_heads, d_head=self.d_head,
                context_dim=self.context_dim, dropout=self.dropout,
                image_cross_attention=self.image_cross_attention,
                image_cross_attention_scale_learnable=self.image_cross_attention_scale_learnable,
                name=f"transformer_blocks_{i}",
            )(x, context=context, deterministic=deterministic)
        x = nn.Dense(self.in_channels, name="proj_out",
                     kernel_init=nn.initializers.zeros,
                     dtype=x.dtype, param_dtype=jnp.float32)(x)
        return x.reshape(b, t, h, w, c) + x_in


class TemporalTransformer(nn.Module):
    """Per-pixel transformer over the T axis (attention.py:313-412).

    Input (B, T, H, W, C) -> attention over T for each of B*H*W columns.
    GroupNorm here uses per-clip statistics (the reference normalizes the
    full b c t h w tensor).
    """

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    causal_attention: bool = False
    relative_position: bool = False
    temporal_length: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, t, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = GroupNorm(32, epsilon=1e-6, num_batch_axes=1, name="norm")(x)
        # Fast path (all shipped configs): stay in the spatial-major
        # (B, T, HW, C) layout end to end — Dense/LayerNorm/FFN touch only
        # the channel axis, and attention mixes T at axis 1 via the
        # time-major packed kernel (ops/small_attention.py::_kernel_tmajor).
        # No transpose ever hits HBM. Rel-pos / causal variants keep the
        # legacy (B, HW, T, C) transpose path (their einsums/masks assume
        # tokens at -2).
        fast = not (self.relative_position or self.causal_attention)
        x = x.reshape(b, t, h * w, c)
        # The dp/sp reshard point. Spatial stages carry T on 'sp'; the
        # temporal stage carries HW on 'sp' with T local. Pinning the
        # pre-reshard layout first stops the HW:'sp' spec propagating
        # backward through the 5D reshape into an H/W-split sharding that
        # forces an involuntary full rematerialization inside the GroupNorm
        # (observed SPMD-partitioner warning).
        x = constrain(x, DATA_AXIS, SEQ_AXIS, None, None)    # still T: sp
        if fast:
            x = constrain(x, DATA_AXIS, None, SEQ_AXIS, None)  # HW: sp
        else:
            x = x.transpose(0, 2, 1, 3)
            x = constrain(x, DATA_AXIS, SEQ_AXIS, None, None)  # HW: sp
        x = nn.Dense(inner, name="proj_in", dtype=x.dtype, param_dtype=jnp.float32)(x)

        mask = None
        if self.causal_attention:
            mask = jnp.tril(jnp.ones((t, t), dtype=bool))

        for i in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner, n_heads=self.n_heads, d_head=self.d_head,
                context_dim=None, dropout=self.dropout,
                relative_position=self.relative_position,
                temporal_length=self.temporal_length,
                tokens_axis1=fast,
                name=f"transformer_blocks_{i}",
            )(x, context=None, mask=mask, deterministic=deterministic)
        x = nn.Dense(self.in_channels, name="proj_out",
                     kernel_init=nn.initializers.zeros,
                     dtype=x.dtype, param_dtype=jnp.float32)(x)
        if fast:
            x = constrain(x, DATA_AXIS, None, SEQ_AXIS, None)  # HW: sp
            x = constrain(x, DATA_AXIS, SEQ_AXIS, None, None)  # back to T: sp
        else:
            x = constrain(x, DATA_AXIS, SEQ_AXIS, None, None)  # HW: sp
            x = x.transpose(0, 2, 1, 3)
            x = constrain(x, DATA_AXIS, SEQ_AXIS, None, None)  # back to T: sp
        x = x.reshape(b, t, h, w, c)
        x = constrain(x, DATA_AXIS, SEQ_AXIS, None, None, None)
        return x + x_in


class SpatialConv(nn.Module):
    """Per-frame k×k conv, lowered as a FOLDED 4D NHWC conv2d.

    The parameter keeps the 5D (1, k, k, I, O) shape (so utils/weights.py's
    torch Conv2d mapping is unchanged), but the input is reshaped
    (B, T, H, W, C) -> (B*T, H, W, C) — a free layout-preserving merge —
    before a standard conv2d. Device-profiled on v5e: the 5D (1,k,k) conv
    forces XLA into a (T, H, B, W, C)-ish conv layout with a full-tensor
    relayout copy on each side plus materialized f32 operand broadcasts;
    the folded conv2d takes the standard NHWC path: 1.07 vs 1.97 ms per
    ds1 conv, 2.3x on the whole GN-SiLU-conv-emb chain (round-3 probes).

    Under an sp-sharded mesh the fold is NOT used: the (B, T)->(B*T) merge
    of a T:'sp'-sharded axis interleaves shards whenever B > 1 (B is the
    major factor, so global row b*T+t mixes every sp shard), and GSPMD
    lowers the reshape as an all-to-all + permute pair around EVERY conv —
    measured on the sp=8 flagship HLO (b=2 CFG): 120 extra all-to-alls.
    The 5D (1,k,k) conv partitions cleanly over T instead (kernel extent 1
    on the sharded axis; ~0.9 ms/conv slower single-chip, which is why the
    fold stays the single-chip path).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    zero_init: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        k = self.kernel
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        kern = self.param("kernel", init, (1, k, k, c, self.features),
                          jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dtype = self.dtype or x.dtype
        pad = k // 2
        if _seq_sharded():
            return (jax.lax.conv_general_dilated(
                x.astype(dtype), kern.astype(dtype),
                (1, self.stride, self.stride),
                [(0, 0), (pad, pad), (pad, pad)],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
                + bias.astype(dtype))
        xb = x.reshape(b * t, h, w, c)
        out = jax.lax.conv_general_dilated(
            xb.astype(dtype), kern[0].astype(dtype),
            (self.stride, self.stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + bias.astype(dtype)
        out = out.reshape(b, t, out.shape[1], out.shape[2], self.features)
        return constrain(out, DATA_AXIS, SEQ_AXIS, None, None, None)


def conv_spatial(features: int, name: str, *, kernel: int = 3, stride: int = 1,
                 zero_init: bool = False, dtype=None):
    """3x3 (or 1x1) per-frame conv on (B,T,H,W,C); folded-conv2d lowering."""
    return SpatialConv(features, kernel=kernel, stride=stride,
                       zero_init=zero_init, dtype=dtype, name=name)


class TemporalConv(nn.Module):
    """(3,1,1) temporal conv (spatial_aware adds an H or W extent of 3),
    lowered as THREE T-SHIFTED matmuls / folded conv2ds instead of a 5D
    conv: y[t] = Σ_dt x[t+dt-1] · K[dt]. Device-profiled on v5e: the 5D
    (3,1,1) conv pays the same conv-layout relayout copies as the spatial
    convs; the shifted-matmul form runs on the standard MXU einsum path —
    1.43 vs 2.15 ms on the GN-SiLU-conv ×2 chain (round-3 probes). The
    parameter keeps the (3, kh, kw, I, O) shape of utils/weights.py's
    torch Conv3d mapping. Under the mesh the ±1 shifts over a T:'sp'
    sharded axis lower to neighbor collective-permutes (halo exchange),
    same as the 5D conv's partitioning."""

    features: int
    spatial_aware: bool = False
    w_axis: bool = False
    zero_init: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        if not self.spatial_aware:
            kh, kw = 1, 1
        elif not self.w_axis:
            kh, kw = 3, 1
        else:
            kh, kw = 1, 3
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        kern = self.param("kernel", init, (3, kh, kw, c, self.features),
                          jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dtype = self.dtype or x.dtype
        if _seq_sharded():
            # T carries 'sp' here: the conv partitioner's halo exchange is
            # 2 neighbor collective-permutes per conv, while the pad+slice
            # shift form repartitions the padded axis (8 permutes measured,
            # tests/test_sp_collectives.py). Keep the 5D conv under sp.
            return jax.lax.conv_general_dilated(
                x.astype(dtype), kern.astype(dtype), (1, 1, 1),
                [(1, 1), (kh // 2, kh // 2), (kw // 2, kw // 2)],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            ) + bias.astype(dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = None
        for dt in range(3):
            xs = xp[:, dt:dt + t].astype(dtype)
            if kh == 1 and kw == 1:
                o = jnp.einsum("bthwc,cf->bthwf", xs,
                               kern[dt, 0, 0].astype(dtype))
            else:
                xb = xs.reshape(b * t, h, w, c)
                xb = constrain(xb, (DATA_AXIS, SEQ_AXIS), None, None, None)
                o = jax.lax.conv_general_dilated(
                    xb, kern[dt].astype(dtype), (1, 1),
                    [(kh // 2, kh // 2), (kw // 2, kw // 2)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                o = o.reshape(b, t, h, w, self.features)
            out = o if out is None else out + o
        return out + bias.astype(dtype)


def conv_temporal(features: int, name: str, *, spatial_aware: bool = False,
                  w_axis: bool = False, zero_init: bool = False, dtype=None):
    """(3,1,1) temporal conv; spatial_aware adds an H or W extent of 3."""
    return TemporalConv(features, spatial_aware=spatial_aware, w_axis=w_axis,
                        zero_init=zero_init, dtype=dtype, name=name)


class TemporalConvBlock(nn.Module):
    """Residual 4-conv temporal block, zero-init last (openaimodel3d.py:239-279)."""

    in_channels: int
    out_channels: Optional[int] = None
    dropout: float = 0.0
    spatial_aware: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        out_ch = self.out_channels or self.in_channels
        identity = x
        gn = lambda name: GroupNorm(32, epsilon=1e-5, num_batch_axes=1, name=name)
        drop = lambda h: (
            nn.Dropout(self.dropout)(h, deterministic=deterministic)
            if self.dropout > 0 else h
        )
        h = conv_temporal(out_ch, "conv1", spatial_aware=self.spatial_aware, dtype=x.dtype)(
            silu(gn("norm1")(x)))
        h = conv_temporal(self.in_channels, "conv2", spatial_aware=self.spatial_aware,
                          w_axis=True, dtype=x.dtype)(drop(silu(gn("norm2")(h))))
        h = conv_temporal(self.in_channels, "conv3", spatial_aware=self.spatial_aware, dtype=x.dtype)(
            drop(silu(gn("norm3")(h))))
        h = conv_temporal(self.in_channels, "conv4", spatial_aware=self.spatial_aware,
                          w_axis=True, zero_init=True, dtype=x.dtype)(drop(silu(gn("norm4")(h))))
        return identity + h


class Downsample(nn.Module):
    """Strided-conv (or avgpool) 2x spatial downsample (openaimodel3d.py:51-77)."""

    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.out_channels or self.channels
        if self.use_conv:
            return conv_spatial(out_ch, "op", stride=2, dtype=x.dtype)(x)
        b, t, h, w, c = x.shape
        return x.reshape(b, t, h // 2, 2, w // 2, 2, c).mean(axis=(3, 5))


class Upsample(nn.Module):
    """Nearest 2x spatial upsample + optional conv (openaimodel3d.py:80-106)."""

    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        if self.use_conv:
            x = conv_spatial(self.out_channels or self.channels, "conv", dtype=x.dtype)(x)
        return x


class ResBlock(nn.Module):
    """GN-SiLU-conv residual block with timestep-embedding add and optional
    temporal conv tail (openaimodel3d.py:109-236)."""

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: Optional[int] = None
    use_scale_shift_norm: bool = False
    use_conv_skip: bool = False
    up: bool = False
    down: bool = False
    use_temporal_conv: bool = False
    tempspatial_aware: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, emb: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        out_ch = self.out_channels or self.channels
        gn_in = GroupNorm(32, epsilon=1e-5, num_batch_axes=2, name="norm_in")
        conv_in = conv_spatial(out_ch, "conv_in", dtype=x.dtype)

        if self.up or self.down:
            resample = Upsample(self.channels, use_conv=False) if self.up else \
                Downsample(self.channels, use_conv=False)
            h = silu(gn_in(x))
            h = resample(h)
            x = resample(x)
            h = conv_in(h)
        else:
            h = conv_in(silu(gn_in(x)))

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            name="emb_proj", dtype=emb.dtype, param_dtype=jnp.float32,
        )(silu(emb)).astype(h.dtype)
        # emb: (B, E) or (B, T, E) (per-frame fs conditioning allowed)
        while emb_out.ndim < h.ndim:
            emb_out = emb_out[:, None] if emb_out.ndim == 2 else emb_out[..., None, :]

        gn_out = GroupNorm(32, epsilon=1e-5, num_batch_axes=2, name="norm_out")
        drop = lambda v: (
            nn.Dropout(self.dropout)(v, deterministic=deterministic)
            if self.dropout > 0 else v
        )
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = gn_out(h) * (1 + scale) + shift
            h = conv_spatial(out_ch, "conv_out", zero_init=True, dtype=x.dtype)(drop(silu(h)))
        else:
            h = h + emb_out
            h = conv_spatial(out_ch, "conv_out", zero_init=True, dtype=x.dtype)(drop(silu(gn_out(h))))

        if out_ch == self.channels:
            skip = x
        elif self.use_conv_skip:
            skip = conv_spatial(out_ch, "skip", dtype=x.dtype)(x)
        else:
            skip = conv_spatial(out_ch, "skip", kernel=1, dtype=x.dtype)(x)
        h = skip + h

        if self.use_temporal_conv:
            h = TemporalConvBlock(
                out_ch, out_ch, dropout=0.1, spatial_aware=self.tempspatial_aware,
                name="tconv",
            )(h, deterministic=deterministic)
        return h
