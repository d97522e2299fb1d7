"""pjit training loop: the Lightning-free trainer.

Replaces main/trainer.py + the Lightning training_step stack
(lvdm/models/ddpm3d.py:786-827, 1052-1128) with a functional pjit design:

  * batch preparation (CFG dropout, conditioning-frame choice, hybrid concat)
    happens INSIDE the jitted step — frozen encoders run on-device, no
    host round trips (reference does this eagerly per batch);
  * v/eps loss (ddpm3d.py:740-784), AdamW + global-norm clip 0.5 + gradient
    accumulation (configs/training_512_v1.0/config.yaml:135-142);
  * EMA shadow params (lvdm/ema.py) as a pytree inside the train state;
  * data-parallel over the 'dp' mesh axis, frame-axis 'sp' sharding inside
    the UNet — XLA inserts the gradient all-reduce (the reference's NCCL
    DDPSharded equivalent, main/utils_train.py:125-136).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dynamicrafter_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from dynamicrafter_tpu.parallel.sharding import (
    DATA_AXIS, constrain, constrain_zero,
)
from dynamicrafter_tpu.training.ema import ema_init, ema_update


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    scale_lr: bool = False           # lr *= num_rank*bs (main/trainer.py:88-93)
    weight_decay: float = 0.0
    grad_clip: float = 0.5
    accumulate_grad_batches: int = 1
    ema_decay: float = 0.9999
    use_ema: bool = True
    uncond_prob: float = 0.05        # 5/5/5% text/image/both dropout
    rand_cond_frame: bool = True
    interp_mode: bool = False
    loss_type: str = "l2"
    parameterization: str = "v"
    noise_strength: float = 0.0      # offset noise (ddpm3d.py:740-747)
    l_simple_weight: float = 1.0     # ddpm3d.py:63,777
    original_elbo_weight: float = 0.0  # weight on loss_vlb (ddpm3d.py:61,782)
    learn_logvar: bool = False       # per-timestep trainable logvar table
                                     # (ddpm3d.py:118-121, 459-460); the
                                     # table lives in trainable["logvar"]
    logvar_init: float = 0.0         # ddpm3d.py:69,119
    remat: bool = True               # rematerialize UNet blocks (grad ckpt)
    # "dots": flat whole-model remat keeping matmul outputs — fits (and
    # marginally wins) only at the 256 recipe; FAILS TO COMPILE at
    # 320x512 b=2 on a 16 GB v5e (measured, scripts/train_probe.py).
    # "blocks": nested per-layer nn.remat (the reference's per-module
    # checkpointing, lvdm/common.py:80-94) — required above 256; at
    # 576x1024 the flat policy needs 55.8 GB vs 16 GB HBM (measured).
    # scripts/train.py --remat_policy auto picks by resolution.
    remat_policy: str = "dots"


def combine_diffusion_losses(loss_simple, t, cfg: TrainConfig, schedule,
                             logvar=None):
    """The reference loss surface after the model call (ddpm3d.py:763-783):
    per-timestep logvar weighting (optionally a learned table),
    l_simple_weight, and the original_elbo_weight * loss_vlb ELBO term.

    loss_simple: (B,) per-sample mean l1/l2 losses. logvar: the
    (num_timesteps,) table — trainable["logvar"] when cfg.learn_logvar,
    else None -> the constant cfg.logvar_init is applied (the reference
    applies the buffer either way; it is only a parameter when learned).
    Oracle-parity-tested against lvdm.models.ddpm3d.LatentDiffusion.p_losses
    at nonzero knob values (tests/test_trainer.py).
    """
    if logvar is not None:
        logvar_t = logvar[t].astype(loss_simple.dtype)
    else:
        logvar_t = jnp.asarray(cfg.logvar_init, loss_simple.dtype)
    loss_gamma = loss_simple / jnp.exp(logvar_t) + logvar_t
    loss = cfg.l_simple_weight * loss_gamma.mean()
    loss_vlb = (schedule.lvlb_weights[t] * loss_simple).mean()
    loss = loss + cfg.original_elbo_weight * loss_vlb
    metrics = {"loss": loss, "loss_simple": loss_simple.mean(),
               "loss_vlb": loss_vlb}
    if cfg.learn_logvar:
        metrics["loss_gamma"] = loss_gamma.mean()
        metrics["logvar"] = logvar.mean()
    return loss, metrics


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any                      # trainable: unet (+ resampler)
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(trainable_params: Any, cfg: TrainConfig,
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> tuple[TrainState, optax.GradientTransformation]:
    if tx is None:
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay),
        )
        if cfg.accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=trainable_params,
        opt_state=tx.init(trainable_params),
        ema_params=ema_init(trainable_params) if cfg.use_ema else None,
    )
    from dynamicrafter_tpu.parallel.sharding import (
        active_mesh, zero_shardings,
    )
    mesh = active_mesh()
    if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
        # place moments/EMA ZeRO-sharded from step 0 (avoids a replicated
        # HBM peak before the first train_step reshards them)
        state = state.replace(
            opt_state=jax.device_put(
                state.opt_state, zero_shardings(state.opt_state, mesh)),
            ema_params=(jax.device_put(
                state.ema_params, zero_shardings(state.ema_params, mesh))
                if state.ema_params is not None else None))
    return state, tx


def make_batch_input(pipe, cfg: TrainConfig):
    """Build the traced conditioning-assembly function
    (get_batch_input equivalent, ddpm3d.py:1058-1128).

    Returned fn(frozen, trainable, batch, rng) -> (z, text_ctx, img_ctx, cc).
    Module-level so tests can pin the batch prep (CFG dropout masks,
    rand_cond_frame, interp first/last-frame concat) directly.
    """
    scale_factor = pipe.config.scale_factor
    t_len = pipe.unet_config.temporal_length
    null_tokens = jnp.asarray(pipe.tokenizer([""]))

    def batch_input(frozen, trainable, batch, rng):
        """get_batch_input equivalent (ddpm3d.py:1058-1128), fully traced."""
        video = batch["video"]
        b, t = video.shape[0], video.shape[1]
        r_drop, r_frame, r_enc = jax.random.split(rng, 3)

        # frozen VAE encode, sampled posterior
        flat = video.reshape((b * t,) + video.shape[2:])
        moments = pipe.vae.apply({"params": frozen["vae"]}, flat,
                                 method=AutoencoderKL.encode_moments)
        znoise = jax.random.normal(r_enc, moments.shape[:-1]
                                   + (moments.shape[-1] // 2,))
        z = DiagonalGaussian(moments).sample(znoise) * scale_factor
        z = z.reshape((b, t) + z.shape[1:])

        # CFG dropout: text in [0,2p), image in [p,3p) (ddpm3d.py:1073-1082)
        random_num = jax.random.uniform(r_drop, (b,))
        prompt_mask = (random_num < 2 * cfg.uncond_prob)[:, None, None]
        input_mask = 1.0 - ((random_num >= cfg.uncond_prob)
                            & (random_num < 3 * cfg.uncond_prob)
                            ).astype(video.dtype)[:, None, None, None]

        text_emb = pipe.text_encoder.apply(
            {"params": frozen["clip_text"]}, batch["tokens"])
        null_emb = pipe.text_encoder.apply(
            {"params": frozen["clip_text"]}, null_tokens)
        text_ctx = jnp.where(prompt_mask, null_emb, text_emb)

        if cfg.rand_cond_frame:
            cond_idx = jax.random.randint(r_frame, (), 0, t_len)
        else:
            cond_idx = jnp.asarray(0)
        img = jnp.take(video, cond_idx, axis=1) * input_mask

        from dynamicrafter_tpu.models.clip import clip_preprocess

        px = clip_preprocess(img, pipe.vision_encoder.config.image_size)
        tokens = pipe.vision_encoder.apply(
            {"params": frozen["clip_vision"]}, px)
        img_ctx = pipe.resampler.apply(
            {"params": trainable["resampler"]}, tokens) \
            if "resampler" in trainable else pipe.resampler.apply(
            {"params": frozen["resampler"]}, tokens)
        img_ctx = img_ctx.reshape(b, t, -1, img_ctx.shape[-1])

        if cfg.interp_mode:
            # first/last-frame latents, zeros elsewhere (ddpm3d.py:1095-1102)
            cc = jnp.zeros_like(z)
            cc = cc.at[:, 0].set(z[:, 0]).at[:, -1].set(z[:, -1])
        else:
            zc = jnp.take(z, cond_idx, axis=1)
            cc = jnp.broadcast_to(zc[:, None], z.shape)

        return z, text_ctx, img_ctx, cc

    return batch_input


def make_train_step(pipe, cfg: TrainConfig, tx: optax.GradientTransformation):
    """Build the jitted train step for a DynamiCrafterPipeline's modules.

    Batch dict: video (B,T,H,W,3) in [-1,1], tokens (B,77) int32,
    fs (B,) int32. Trainable = UNet (+ image_proj/resampler,
    ddpm3d.py:1202-1216); VAE and CLIP towers are frozen.
    """
    schedule = pipe.schedule
    unet = pipe.unet
    if cfg.remat and cfg.remat_policy == "blocks":
        # nested per-layer remat INSIDE the module tree (param structure is
        # unchanged — nn.remat is transparent to variable scoping); the
        # outer flat checkpoint below is skipped for this policy because a
        # single-level checkpoint cannot segment the backward (measured
        # 55.8/43.7 GB vs 16 GB HBM at 576x1024 on v5e)
        from dynamicrafter_tpu.models.unet3d import UNetModel
        unet = UNetModel(unet.config, dtype=unet.dtype, remat_layers=True)
    batch_input = make_batch_input(pipe, cfg)

    def loss_fn(trainable, frozen, batch, rng):
        r_batch, r_t, r_noise = jax.random.split(rng, 3)
        z, text_ctx, img_ctx, cc = batch_input(frozen, trainable, batch, r_batch)
        b = z.shape[0]
        z = constrain(z, DATA_AXIS)

        t = jax.random.randint(r_t, (b,), 0, schedule.num_timesteps)
        if schedule.scale_arr is not None:
            # dynamic rescale of x0 (ddpm3d.py:711-715)
            from dynamicrafter_tpu.schedule import extract_into_tensor
            z = z * extract_into_tensor(schedule.scale_arr, t, z.ndim)
        noise = jax.random.normal(r_noise, z.shape, z.dtype)
        if cfg.noise_strength > 0:
            # per-(batch, frame, channel) offset noise (ddpm3d.py:741-744)
            r_noise2 = jax.random.fold_in(r_noise, 1)
            offset = jax.random.normal(
                r_noise2, z.shape[:2] + (1, 1, z.shape[-1]), z.dtype)
            noise = noise + cfg.noise_strength * offset
        x_noisy = schedule.q_sample(z, t, noise)

        if cfg.parameterization == "v":
            target = schedule.get_v(z, noise, t)
        elif cfg.parameterization == "eps":
            target = noise
        else:
            target = z

        xc = jnp.concatenate([x_noisy, cc], axis=-1)
        unet_apply = lambda p, xin, ts, ct, ci, fsv: unet.apply(
            {"params": p}, xin, ts, context_text=ct, context_img=ci,
            fs=fsv, deterministic=True)
        if cfg.remat and cfg.remat_policy != "blocks":
            # flat whole-model remat keeping matmul outputs — only fits the
            # 256 recipe on a 16 GB chip (fails to compile at 512 b=2,
            # measured); "blocks" uses nested per-layer remat via
            # UNetModel(remat_layers=True) above instead
            unet_apply = jax.checkpoint(
                unet_apply,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        pred = unet_apply(trainable["unet"], xc, t, text_ctx, img_ctx,
                          batch.get("fs"))
        if cfg.loss_type == "l1":
            loss_simple = jnp.abs(pred - target).mean(axis=(1, 2, 3, 4))
        else:
            loss_simple = jnp.square(pred - target).mean(axis=(1, 2, 3, 4))
        logvar = trainable.get("logvar") if cfg.learn_logvar else None
        if cfg.learn_logvar and logvar is None:
            raise ValueError("learn_logvar=True needs a trainable['logvar'] "
                             "(num_timesteps,) table — scripts/train.py "
                             "seeds it from logvar_init")
        return combine_diffusion_losses(loss_simple, t, cfg, schedule,
                                        logvar)

    def eval_step(state: TrainState, frozen, batch, rng):
        """Validation losses with and without EMA weights
        (reference validation_step, ddpm3d.py:398-405)."""
        _, m = loss_fn(state.params, frozen, batch, rng)
        out = {"val/loss": m["loss"], "val/loss_simple": m["loss_simple"],
               "val/loss_vlb": m["loss_vlb"]}
        if state.ema_params is not None:
            _, m_ema = loss_fn(state.ema_params, frozen, batch, rng)
            out["val/loss_ema"] = m_ema["loss"]
        return out

    def train_step(state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, rng)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        # ZeRO-2 equivalent (reference default DDPSharded,
        # main/utils_train.py:126-128): AdamW moments + EMA shadow sharded
        # over dp — XLA reduce-scatters grads into the sharded update and
        # all-gathers only the applied param delta
        new_opt = constrain_zero(new_opt)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            new_ema = ema_update(new_ema, new_params, state.step,
                                 cfg.ema_decay)
            new_ema = constrain_zero(new_ema)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt, ema_params=new_ema), metrics

    train_step.eval_step = eval_step  # validation companion
    return train_step
