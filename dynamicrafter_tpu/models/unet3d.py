"""The 3D (factorized spatial/temporal) UNet denoiser.

TPU-first redesign of the reference UNetModel
(lvdm/modules/networks/openaimodel3d.py:281-603):

  * Activations stay (B, T, H, W, C) channels-last end to end; spatial convs
    are (1,3,3) kernels so the frame axis is never folded into batch.
  * The text context is NOT repeat_interleaved per frame (reference :556-563)
    — dual cross-attention broadcasts text K/V across frames and reads the
    per-frame image tokens directly, saving 16x context bandwidth.
  * Timestep/fs embeddings broadcast over T instead of repeat_interleave.
  * Sharding: batch on 'dp', frames on 'sp' in spatial stages; temporal
    stages transpose to (B, HW, T, C) where HW carries 'sp'
    (see parallel/sharding.py).

Flax submodule names mirror the reference checkpoint indices
(input_blocks_{i}_{j}, middle_block_{j}, output_blocks_{i}_{j}) so the weight
converter is a mechanical per-kind rename.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynamicrafter_tpu import schedule as sched
from dynamicrafter_tpu.models.blocks import (
    Downsample,
    ResBlock,
    SpatialTransformer,
    TemporalTransformer,
    Upsample,
    conv_spatial,
    silu,
)
from dynamicrafter_tpu.ops.norms import GroupNorm
from dynamicrafter_tpu.parallel.sharding import DATA_AXIS, SEQ_AXIS, constrain


def _flash_residual_policy():
    """Remat policy for the per-layer checkpoint boundaries: save the flash
    attention kernel residuals (out + lse, tagged in ops/flash_attention.py's
    _nlhd_vjp_fwd) so the backward segment feeds _flash_bwd directly instead
    of re-running the flash forward (measured 174 ms/step of recompute at
    576x1024). Everything else (projections, norms, convs) stays rematted —
    saving the two bf16/f32 residuals costs ~0.6 GB at 72x128x16 vs the
    ~47 GB a no-remat backward would need."""
    return jax.checkpoint_policies.save_only_these_names(
        "flash_out", "flash_lse")


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    conv_resample: bool = True
    context_dim: Optional[int] = 1024
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    num_heads: int = -1
    num_head_channels: int = 64
    transformer_depth: int = 1
    use_linear: bool = True  # kept for config compat; both map to Dense
    use_checkpoint: bool = False  # remat
    temporal_conv: bool = True
    tempspatial_aware: bool = False
    temporal_attention: bool = True
    use_relative_position: bool = False
    use_causal_attention: bool = False
    temporal_length: Optional[int] = 16
    addition_attention: bool = True
    temporal_selfatt_only: bool = True
    image_cross_attention: bool = True
    image_cross_attention_scale_learnable: bool = False
    default_fs: int = 3
    fs_condition: bool = False
    text_context_len: int = 77

    def heads_for(self, ch: int) -> Tuple[int, int]:
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    @classmethod
    def from_dict(cls, d: dict) -> "UNetConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in known:
                continue
            if isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
        return cls(**kwargs)


class TimeEmbedMLP(nn.Module):
    """Dense-SiLU-Dense timestep embedding MLP (openaimodel3d.py:370-374)."""

    out_dim: int
    zero_init_last: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.out_dim, name="dense0",
                     dtype=x.dtype, param_dtype=jnp.float32)(x)
        x = silu(x)
        last_init = nn.initializers.zeros if self.zero_init_last \
            else nn.initializers.lecun_normal()
        return nn.Dense(self.out_dim, name="dense2", kernel_init=last_init,
                        bias_init=nn.initializers.zeros,
                        dtype=x.dtype, param_dtype=jnp.float32)(x)


def _build_level_specs(cfg: UNetConfig):
    """Static topology: returns (input_specs, middle_spec, output_specs).

    Mirrors the construction loops in openaimodel3d.py:383-540 so block
    indices line up with reference checkpoint keys.
    """
    input_specs = [[("conv_first", cfg.model_channels)]]
    input_chans = [cfg.model_channels]
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [("res", ch, mult * cfg.model_channels)]
            ch = mult * cfg.model_channels
            if ds in cfg.attention_resolutions:
                layers.append(("spatial", ch))
                if cfg.temporal_attention:
                    layers.append(("temporal", ch))
            input_specs.append(layers)
            input_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_specs.append([("down", ch)])
            input_chans.append(ch)
            ds *= 2

    middle_spec = [("res", ch, ch), ("spatial", ch)]
    if cfg.temporal_attention:
        middle_spec.append(("temporal", ch))
    middle_spec.append(("res", ch, ch))

    output_specs = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_chans.pop()
            layers = [("res", ch + ich, mult * cfg.model_channels)]
            ch = mult * cfg.model_channels
            if ds in cfg.attention_resolutions:
                layers.append(("spatial", ch))
                if cfg.temporal_attention:
                    layers.append(("temporal", ch))
            if level and i == cfg.num_res_blocks:
                layers.append(("up", ch))
                ds //= 2
            output_specs.append(layers)
    return input_specs, middle_spec, output_specs


class UNetModel(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    # Per-LAYER nested remat (the reference's per-module grad checkpointing,
    # lvdm/common.py:80-94 + use_checkpoint in openaimodel3d.py): each
    # res/spatial/temporal layer becomes its own backward segment, so the
    # 576x1024 backward holds one layer's intermediates at a time instead
    # of the whole graph's (55.8 GB with a flat checkpoint, measured on
    # v5e — a single outer jax.checkpoint cannot segment the backward; XLA
    # schedules all recomputed segments concurrently). Identity for
    # forward-only use; enable for training via
    # TrainConfig.remat_policy="blocks".
    remat_layers: bool = False

    def _make_layer(self, spec, name):
        cfg = self.config
        kind = spec[0]

        def maybe_remat(cls, n_args):
            # static_argnums counts self at 0; `deterministic` is the last
            # positional arg of every block __call__ (n_args includes it)
            if not self.remat_layers:
                return cls
            return nn.remat(cls, static_argnums=(n_args,),
                            policy=_flash_residual_policy())

        if kind == "conv_first":
            return conv_spatial(spec[1], name, dtype=self.dtype)
        if kind == "res":
            _, in_ch, out_ch = spec
            return maybe_remat(ResBlock, 3)(
                channels=in_ch, emb_channels=cfg.model_channels * 4,
                dropout=cfg.dropout, out_channels=out_ch,
                use_scale_shift_norm=cfg.use_scale_shift_norm,
                use_temporal_conv=cfg.temporal_conv,
                tempspatial_aware=cfg.tempspatial_aware, name=name,
            )
        if kind == "spatial":
            ch = spec[1]
            heads, dim_head = cfg.heads_for(ch)
            return maybe_remat(SpatialTransformer, 3)(
                in_channels=ch, n_heads=heads, d_head=dim_head,
                depth=cfg.transformer_depth, dropout=cfg.dropout,
                context_dim=cfg.context_dim,
                image_cross_attention=cfg.image_cross_attention,
                image_cross_attention_scale_learnable=cfg.image_cross_attention_scale_learnable,
                name=name,
            )
        if kind == "temporal":
            ch = spec[1]
            heads, dim_head = cfg.heads_for(ch)
            return maybe_remat(TemporalTransformer, 2)(
                in_channels=ch, n_heads=heads, d_head=dim_head,
                depth=cfg.transformer_depth, dropout=cfg.dropout,
                causal_attention=cfg.use_causal_attention,
                relative_position=cfg.use_relative_position,
                temporal_length=cfg.temporal_length, name=name,
            )
        if kind == "down":
            return Downsample(spec[1], use_conv=cfg.conv_resample, name=name)
        if kind == "up":
            return Upsample(spec[1], use_conv=cfg.conv_resample, name=name)
        raise ValueError(kind)

    def setup(self):
        cfg = self.config
        time_embed_dim = cfg.model_channels * 4
        self.time_embed = TimeEmbedMLP(time_embed_dim, name="time_embed")
        if cfg.fs_condition:
            self.fps_embedding = TimeEmbedMLP(
                time_embed_dim, zero_init_last=True, name="fps_embedding")

        in_specs, mid_spec, out_specs = _build_level_specs(cfg)
        self._in_specs, self._mid_spec, self._out_specs = in_specs, mid_spec, out_specs

        self.input_layers = [
            [self._make_layer(s, f"input_blocks_{i}_{j}") for j, s in enumerate(block)]
            for i, block in enumerate(in_specs)
        ]
        if cfg.addition_attention:
            init_cls = (nn.remat(TemporalTransformer, static_argnums=(2,),
                                 policy=_flash_residual_policy())
                        if self.remat_layers else TemporalTransformer)
            self.init_attn = init_cls(
                in_channels=cfg.model_channels, n_heads=8,
                d_head=cfg.num_head_channels, depth=cfg.transformer_depth,
                causal_attention=False, relative_position=cfg.use_relative_position,
                temporal_length=cfg.temporal_length, name="init_attn",
            )
        self.middle_layers = [
            self._make_layer(s, f"middle_block_{j}") for j, s in enumerate(mid_spec)
        ]
        self.output_layers = [
            [self._make_layer(s, f"output_blocks_{i}_{j}") for j, s in enumerate(block)]
            for i, block in enumerate(out_specs)
        ]
        self.out_norm = GroupNorm(32, epsilon=1e-5, num_batch_axes=2, name="out_norm")
        self.out_conv = conv_spatial(cfg.out_channels, "out_conv", zero_init=True, dtype=self.dtype)

    def _apply_block(self, layers, specs, h, emb, context, deterministic):
        for layer, spec in zip(layers, specs):
            kind = spec[0]
            # positional calls: kwargs do not route through nn.remat's
            # static_argnums when remat_layers is on
            if kind in ("conv_first",):
                h = layer(h)
            elif kind == "res":
                h = layer(h, emb, deterministic)
            elif kind == "spatial":
                h = layer(h, context, deterministic)
            elif kind == "temporal":
                h = layer(h, deterministic)
            else:  # down / up
                h = layer(h)
            h = constrain(h, DATA_AXIS, SEQ_AXIS, None, None, None)
        return h

    def __call__(
        self,
        x: jax.Array,                      # (B, T, H, W, C_in)
        timesteps: jax.Array,              # (B,)
        context_text: Optional[jax.Array] = None,   # (B, Lt, Cc)
        context_img: Optional[jax.Array] = None,    # (B, T, Li, Cc)
        fs: Optional[jax.Array] = None,    # (B,)
        deterministic: bool = True,
        cache: Optional[jax.Array] = None,
        return_cache: bool = False,
    ) -> jax.Array:
        """Denoise x. DeepCache seam (Ma et al., CVPR'24 — no reference
        counterpart): `return_cache=True` additionally returns the deep
        feature entering the top-level (ds1) output blocks; passing that
        feature as `cache` runs a SHALLOW forward — only the ds1 input
        blocks (for their skip connections), the cached deep feature, and
        the ds1 output blocks — skipping every deeper level and the middle
        block. shallow(x, t, cache=full_cache(x, t)) is bit-identical to
        the full forward; reusing a cache across adjacent DDIM steps is the
        (documented, opt-in) approximation."""
        cfg = self.config
        b, t = x.shape[0], x.shape[1]
        dtype = self.dtype
        x = x.astype(dtype)
        if context_text is not None:
            context_text = context_text.astype(dtype)
        if context_img is not None:
            context_img = context_img.astype(dtype)

        t_emb = sched.timestep_embedding(timesteps, cfg.model_channels).astype(dtype)
        emb = self.time_embed(t_emb)
        if cfg.fs_condition:
            if fs is None:
                fs = jnp.full((b,), cfg.default_fs, dtype=jnp.int32)
            fs_emb = sched.timestep_embedding(fs, cfg.model_channels).astype(dtype)
            emb = emb + self.fps_embedding(fs_emb)

        context = (context_text, context_img)

        # Remat for training lives in the module tree: remat_layers=True
        # wraps every block class in nn.remat with the flash-residual
        # policy (per-LAYER recompute segments — what makes the 576x1024
        # training step fit 16 GB HBM; the flat dots_saveable policy needs
        # 55.8 GB, measured; see training/trainer.py remat_policy).

        # DeepCache seam: the top (ds1) level is conv_first + num_res_blocks
        # input blocks and the last num_res_blocks+1 output blocks.
        n_top_in = 1 + cfg.num_res_blocks
        n_top_out = cfg.num_res_blocks + 1
        if (cache is not None or return_cache) and len(cfg.channel_mult) < 2:
            raise ValueError("DeepCache needs >=2 UNet levels")

        h = constrain(x, DATA_AXIS, SEQ_AXIS, None, None, None)
        hs = []
        in_blocks = list(zip(self.input_layers, self._in_specs))
        if cache is not None:
            in_blocks = in_blocks[:n_top_in]
        for i, (layers, specs) in enumerate(in_blocks):
            h = self._apply_block(layers, specs, h, emb, context, deterministic)
            if i == 0 and cfg.addition_attention:
                h = self.init_attn(h, deterministic)
            hs.append(h)

        cache_out = None
        if cache is not None:
            h = cache.astype(dtype)
            out_blocks = list(zip(self.output_layers, self._out_specs))[-n_top_out:]
        else:
            h = self._apply_block(self.middle_layers, self._mid_spec, h, emb,
                                  context, deterministic)
            out_blocks = list(zip(self.output_layers, self._out_specs))
        seam = len(out_blocks) - n_top_out
        for i, (layers, specs) in enumerate(out_blocks):
            if i == seam and return_cache:
                cache_out = h
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._apply_block(layers, specs, h, emb, context, deterministic)

        h = self.out_conv(silu(self.out_norm(h)))
        if return_cache:
            return h, cache_out
        return h
