"""Training CLI: fine-tune DynamiCrafter-TPU from a config + checkpoint.

Replaces main/trainer.py (Lightning) with a pjit loop. Reads reference-style
training YAMLs (model: / data: / lightning: roots, e.g.
configs/training_512_v1.0.yaml): base_learning_rate + scale_lr
(trainer.py:88-93), accumulate_grad_batches / max_steps / gradient_clip_val
(lightning.trainer), checkpoint intervals (lightning.callbacks), sample
logging (ImageLogger params).

Signals (reference trainer.py:129-143): SIGUSR1 -> checkpoint immediately.

Run:
  python scripts/train.py --config configs/training_512_v1.0.yaml \
      --name run0 --logdir ./logs [--pretrained model.ckpt] [--auto_resume]
  (add --synthetic_data for a data-free smoke run)
"""
from __future__ import annotations

import argparse
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config", "--base", "-b", dest="config", type=str,
                   nargs="+", required=True,
                   help="YAML config(s), merged left-to-right (reference "
                        "--base/-b, main/trainer.py:19-21)")
    p.add_argument("--name", type=str, default="run")
    p.add_argument("--logdir", type=str, default="./logs")
    p.add_argument("--pretrained", type=str, default=None,
                   help="torch .ckpt (converted) or orbax params dir")
    p.add_argument("--auto_resume", action="store_true",
                   help="resume full train state (step/opt/EMA) from the "
                        "latest checkpoint (reference trainer.py:27)")
    p.add_argument("--auto_resume_weight_only", action="store_true",
                   help="resume weights + EMA only: fresh optimizer and "
                        "step counter (reference trainer.py:28)")
    p.add_argument("--train", "-t", action="store_true",
                   help="accepted for reference-CLI compatibility "
                        "(trainer.py:22) — this CLI always trains")
    p.add_argument("--val", "-v", action="store_true",
                   help="accepted for compatibility (trainer.py:23); use "
                        "--val_every N for in-training validation")
    p.add_argument("--test", action="store_true",
                   help="accepted for compatibility (trainer.py:24); no "
                        "separate test loop exists (none does meaningful "
                        "work in the reference configs either)")
    p.add_argument("--debug", "-d", action="store_true",
                   help="verbose (DEBUG-level) logging (reference "
                        "trainer.py:29 post-mortem equivalent)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--bs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=20230211)
    p.add_argument("--dp", type=int, default=-1, help="data axis (-1: all)")
    p.add_argument("--sp", type=int, default=1, help="frame/seq axis")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat_policy", choices=["auto", "dots", "blocks"],
                   default="auto",
                   help="grad-checkpoint policy: dots keeps matmul outputs "
                        "(fastest, fits <=320x512); blocks keeps only UNet "
                        "block boundaries (needed at 576x1024); auto picks "
                        "by resolution")
    p.add_argument("--synthetic_data", action="store_true")
    p.add_argument("--loader", choices=["threads", "grain"], default="threads",
                   help="input pipeline: in-process decode threads or Grain "
                        "worker processes (multi-host IO)")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--sample_every", type=int, default=0,
                   help="0 disables sample logging")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for steps [10, 10+N)")
    p.add_argument("--val_every", type=int, default=0,
                   help="validation loss (with/without EMA) every N steps")
    p.add_argument("--vocab_path", default=None,
                   help="CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz)")
    p.add_argument("--compile_cache_dir", type=str, default=None,
                   help="persistent XLA compile cache: restarts/resumes "
                        "skip the train-step compile (utils/compile_cache.py)")
    return p


def deep_update(base: dict, extra: dict) -> dict:
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


def main():
    args = get_parser().parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    if args.compile_cache_dir:
        from dynamicrafter_tpu.utils.compile_cache import enable
        enable(args.compile_cache_dir)

    from dynamicrafter_tpu.config import ModelConfig
    from dynamicrafter_tpu.data.webvid import (
        DataLoader, SyntheticVideoDataset, WebVidDataset,
    )
    from dynamicrafter_tpu.parallel.sharding import create_mesh, use_mesh
    from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline
    from dynamicrafter_tpu.training.checkpoints import CheckpointManager
    from dynamicrafter_tpu.training.logging import (
        MetricLogger, SampleLogger, setup_logger,
    )
    from dynamicrafter_tpu.training.trainer import (
        TrainConfig, create_train_state, make_train_step,
    )

    raw = {}
    for path in args.config:
        with open(path) as f:
            deep_update(raw, yaml.safe_load(f))

    workdir = os.path.join(args.logdir, args.name)
    os.makedirs(workdir, exist_ok=True)
    log = setup_logger(workdir)
    if args.debug:
        import logging as _logging
        log.setLevel(_logging.DEBUG)

    model_cfg = ModelConfig(raw)
    lightning = raw.get("lightning", {})
    trainer_cfg = lightning.get("trainer", {})
    data_cfg = raw.get("data", {}).get("params", {})

    base_lr = args.lr or raw.get("model", {}).get("base_learning_rate", 1e-5)
    scale_lr = raw.get("model", {}).get("scale_lr", False)
    bs = args.bs or data_cfg.get("batch_size", 1)
    max_steps = args.max_steps or trainer_cfg.get("max_steps", 100000)
    accum = trainer_cfg.get("accumulate_grad_batches", 1)
    grad_clip = trainer_cfg.get("gradient_clip_val", 0.5)

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        dp = args.dp if args.dp > 0 else n_dev // args.sp
        mesh = create_mesh(dp=dp, sp=args.sp)
    lr = base_lr * (n_dev * bs if scale_lr else 1.0)  # trainer.py:88-93
    log.info(f"devices={n_dev} mesh={mesh} lr={lr} bs={bs} accum={accum}")

    from dynamicrafter_tpu.utils.tokenizer import default_tokenizer

    # cast_storage=False: trainable params / optimizer moments / EMA must stay
    # fp32 — bf16 storage rounds away ~1e-5-relative AdamW updates. Compute
    # still runs in `dtype`; frozen towers get bf16 storage below.
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    tokenizer = default_tokenizer(args.vocab_path)
    pipe = DynamiCrafterPipeline(model_cfg, dtype=dtype, mesh=mesh,
                                 tokenizer=tokenizer, cast_storage=False)

    if not args.pretrained and model_cfg.pretrained_checkpoint:
        # YAML-driven pretrained weights (reference main/utils_train.py:
        # 138-160 load_checkpoints reads model.pretrained_checkpoint)
        if os.path.exists(model_cfg.pretrained_checkpoint):
            args.pretrained = model_cfg.pretrained_checkpoint
        else:
            log.info(f"pretrained_checkpoint "
                     f"{model_cfg.pretrained_checkpoint!r} not found on "
                     f"disk; training from the CLI-provided or random init")
    if args.pretrained and args.pretrained.endswith((".ckpt", ".pt", ".pth")):
        loaded = DynamiCrafterPipeline.from_checkpoint(
            args.config[0], args.pretrained, dtype=dtype, mesh=mesh,
            tokenizer=tokenizer, cast_storage=False)
        pipe.params = loaded.params
        log.info(f"loaded pretrained torch checkpoint {args.pretrained}")
    else:
        pipe.init_random(seed=args.seed, latent_hw=tuple(
            model_cfg.params.get("image_size", [40, 64])))
        if args.pretrained:
            from dynamicrafter_tpu.training.checkpoints import load_params
            pipe.params = load_params(args.pretrained, pipe.params)
            log.info(f"loaded orbax params {args.pretrained}")
        else:
            log.info("WARNING: random-init weights (no pretrained checkpoint)")

    image_size = model_cfg.params.get("image_size", [40, 64])
    if args.remat_policy == "auto":
        # dots_saveable needs ~56 GB at 72x128 latents and fails to even
        # compile at 40x64 b=2 on v5e (scripts/train_probe.py: dots/
        # dots_flash FAILED, blocks 1071 ms/step); flat remat only fits
        # the 256 recipe, so auto uses per-layer block remat above it
        remat_policy = "blocks" if image_size[0] * image_size[1] > 32 * 32 \
            else "dots"
    else:
        remat_policy = args.remat_policy
    log.info(f"remat policy: {remat_policy}")

    tcfg = TrainConfig(
        learning_rate=lr,
        remat_policy=remat_policy,
        grad_clip=grad_clip,
        accumulate_grad_batches=accum,
        uncond_prob=model_cfg.uncond_prob,
        rand_cond_frame=model_cfg.rand_cond_frame,
        interp_mode=model_cfg.interp_mode,
        parameterization=model_cfg.parameterization,
        loss_type=model_cfg.loss_type,
        noise_strength=model_cfg.params.get("noise_strength", 0.0),
        use_ema=model_cfg.params.get("use_ema", False),
        remat=model_cfg.unet.get("use_checkpoint", True),
        l_simple_weight=model_cfg.params.get("l_simple_weight", 1.0),
        original_elbo_weight=model_cfg.params.get("original_elbo_weight",
                                                  0.0),
        learn_logvar=model_cfg.params.get("learn_logvar", False),
        logvar_init=model_cfg.params.get("logvar_init", 0.0),
    )
    log.info(f"batch prep: interp_mode={tcfg.interp_mode} "
             f"rand_cond_frame={tcfg.rand_cond_frame} "
             f"uncond_prob={tcfg.uncond_prob}")
    trainable = {"unet": pipe.params["unet"]}
    if model_cfg.params.get("image_proj_model_trainable", True) \
            and "resampler" in pipe.params:
        trainable["resampler"] = pipe.params["resampler"]
    if tcfg.learn_logvar:
        # per-timestep trainable logvar table (ddpm3d.py:118-121; added to
        # the optimizer at ddpm3d.py:459-460). Rides the trainable pytree,
        # so ZeRO sharding / checkpointing / EMA cover it automatically
        # (the reference excludes it from EMA; the shadow copy here is
        # inert — nothing reads logvar at sampling time).
        trainable["logvar"] = jnp.full((model_cfg.timesteps,),
                                       tcfg.logvar_init, jnp.float32)
    frozen = {k: v for k, v in pipe.params.items() if k not in trainable}
    if args.bf16:
        # frozen towers (VAE, CLIP) are inference-only: bf16 storage is safe
        # and halves their HBM + weight bandwidth
        from dynamicrafter_tpu.utils import weights as W
        frozen = W.cast_params(frozen, jnp.bfloat16)

    with use_mesh(mesh):
        state, tx = create_train_state(trainable, tcfg)
    raw_step = make_train_step(pipe, tcfg, tx)
    step_fn = jax.jit(raw_step, donate_argnums=(0,))
    eval_fn = jax.jit(raw_step.eval_step)

    ckpt_cfg = lightning.get("callbacks", {}).get("model_checkpoint", {}) \
        .get("params", {})
    ckpt_every = ckpt_cfg.get("every_n_train_steps", 9000)
    # monitored best-k retention (reference main/utils_train.py:68-73: a
    # model.params.monitor key switches ModelCheckpoint to save_top_k=3
    # mode='min'); typical monitor: val/loss_ema
    monitor = model_cfg.params.get("monitor")
    if monitor:
        log.info(f"monitoring {monitor} as checkpoint metric (top-3, min)")
    mngr = CheckpointManager(os.path.join(workdir, "checkpoints"),
                             max_to_keep=3, monitor=monitor,
                             top_k=ckpt_cfg.get("save_top_k", 3),
                             mode=ckpt_cfg.get("mode", "min"))
    if args.auto_resume:
        restored = mngr.restore(state)
        if restored is not None:
            state = restored
            log.info(f"resumed from step {int(state.step)}")
    elif args.auto_resume_weight_only:
        # reference trainer.py:28 / utils_train.py:138-160: load weights
        # (+EMA shadow) from the latest checkpoint, fresh optimizer + step
        restored = mngr.restore(state)
        if restored is not None:
            state = state.replace(params=restored.params,
                                  ema_params=restored.ema_params)
            log.info("weight-only resume from step "
                     f"{int(restored.step)} (optimizer/step reset)")

    # data — the batch key feeding the UNet's fps_embedding follows
    # fps_condition_type (reference ddpm3d.py:1118-1121): 'fps' -> real
    # frames/sec, anything else ('fs') -> frame stride
    fs_key = "fps" if model_cfg.fps_condition_type == "fps" else "frame_stride"
    num_workers = data_cfg.get("num_workers", 4)

    def build_dataset(split_params, split_name):
        if args.synthetic_data or not split_params:
            res = tuple(split_params.get("resolution", (64, 64)))
            log.info(f"using SyntheticVideoDataset for {split_name}")
            return SyntheticVideoDataset(
                video_length=split_params.get(
                    "video_length", pipe.unet_config.temporal_length or 16),
                resolution=res)
        return WebVidDataset(
            meta_path=split_params["meta_path"],
            data_dir=split_params["data_dir"],
            video_length=split_params.get("video_length", 16),
            frame_stride=split_params.get("frame_stride", 4),
            resolution=tuple(split_params.get("resolution", (320, 512))),
            random_fs=split_params.get("random_fs", False),
            fixed_fps=split_params.get("fixed_fps"),
            fps_max=split_params.get("fps_max"),
        )

    tr = data_cfg.get("train", {}).get("params", {})
    dataset = build_dataset(tr, "train")
    from dynamicrafter_tpu.data.grain_loader import make_loader

    loader = make_loader(args.loader, dataset, batch_size=bs,
                         tokenizer=pipe.tokenizer,
                         seed=args.seed, num_workers=num_workers,
                         fs_key=fs_key,
                         shard_id=jax.process_index(),
                         num_shards=jax.process_count())

    # real validation split (reference main/utils_data.py:44-136 builds a
    # val loader; validating on the train batch is meaningless)
    val_iter = None
    if args.val_every:
        va = data_cfg.get("validation", {}).get("params", {})
        val_dataset = build_dataset(va or tr, "validation")
        val_loader = make_loader(args.loader, val_dataset, batch_size=bs,
                                 tokenizer=pipe.tokenizer,
                                 shuffle=False, seed=args.seed + 1,
                                 num_workers=num_workers, fs_key=fs_key,
                                 shard_id=jax.process_index(),
                                 num_shards=jax.process_count())
        val_iter = iter(val_loader)

    metrics_log = MetricLogger(workdir)
    sample_logger = None
    if args.sample_every > 0:
        bl = lightning.get("callbacks", {}).get("batch_logger", {}) \
            .get("params", {})
        sample_logger = SampleLogger(
            pipe, workdir, every_n_steps=args.sample_every,
            sample_kwargs=bl.get("log_images_kwargs"))

    # SIGUSR1 -> immediate checkpoint (reference trainer.py:129-143)
    want_ckpt = {"now": False}
    signal.signal(signal.SIGUSR1, lambda *_: want_ckpt.update(now=True))

    rng = jax.random.PRNGKey(args.seed)
    t_last = time.time()
    profiling = False
    # host-side step counter: `int(state.step)` is a blocking device fetch
    # (one tunnel round-trip per step under the remote TPU backend) and
    # caps the dispatch queue at depth 1; tracking the step on the host
    # lets XLA dispatch run ahead and only metric/val fetches synchronize
    step = int(state.step)
    m = None
    last_val = {}   # most recent val metrics (feeds monitored checkpoints)
    with use_mesh(mesh):
        for batch in loader:
            if step >= max_steps:
                break
            # the host step counter lets dispatch run ahead of execution, so
            # the trace window must be fenced by scalar fetches (the only
            # reliable sync here — block_until_ready lies on this backend)
            if args.profile_steps and step == 10 and not profiling:
                if m is not None:
                    jax.tree_util.tree_map(float, m)
                jax.profiler.start_trace(os.path.join(workdir, "profile"))
                profiling = True
            if profiling and step >= 10 + args.profile_steps:
                if m is not None:
                    jax.tree_util.tree_map(float, m)
                jax.profiler.stop_trace()
                profiling = False
                log.info("profiler trace written")
            jbatch = {"video": jnp.asarray(batch["video"]),
                      "tokens": jnp.asarray(batch["tokens"]),
                      "fs": jnp.asarray(batch["fs"])}
            state, m = step_fn(state, frozen, jbatch, rng)
            step += 1
            if val_iter is not None and step % args.val_every == 0:
                vb = next(val_iter)
                jval = {"video": jnp.asarray(vb["video"]),
                        "tokens": jnp.asarray(vb["tokens"]),
                        "fs": jnp.asarray(vb["fs"])}
                vals = eval_fn(state, frozen, jval, rng)
                last_val = {k: float(v) for k, v in vals.items()}
                metrics_log.log(step, last_val)
                log.info(f"step {step} val: " + " ".join(
                    f"{k}={v:.4g}" for k, v in last_val.items()))
            if step % args.log_every == 0:
                vals = {k: float(v) for k, v in m.items()}
                vals["steps_per_s"] = args.log_every / (time.time() - t_last)
                t_last = time.time()
                # peak_hbm_gb etc. in the console line too (the reference
                # CUDACallback prints peak memory, main/callbacks.py:104-133)
                vals.update(metrics_log.device_memory_stats())
                metrics_log.log(step, vals)
                log.info(f"step {step}: " + " ".join(
                    f"{k}={v:.4g}" for k, v in vals.items()))
            if step % ckpt_every == 0 or want_ckpt["now"]:
                pipe.params = {**frozen, **{k: state.params[k]
                                            for k in trainable}}
                mngr.save(step, state, force=want_ckpt["now"],
                          metrics=last_val)
                want_ckpt["now"] = False
                log.info(f"checkpoint at step {step}")
            if sample_logger is not None:
                # EMA-scoped sampling (reference ema_scope, ddpm3d.py:188-201):
                # swap EMA weights in for the sample, restore afterwards —
                # pipe.params must not permanently become the EMA shadow
                eval_params = (state.ema_params if state.ema_params is not None
                               else state.params)
                saved = pipe.params
                try:
                    pipe.params = {**frozen, **{k: eval_params[k]
                                                for k in trainable}}
                    sample_logger.maybe_log(step, batch)
                finally:
                    pipe.params = saved
    # final save is idempotent: the loop may already have checkpointed this
    # step (ckpt_every divides max_steps / SIGUSR1), and orbax raises
    # StepAlreadyExistsError on a re-save rather than overwriting
    if mngr.latest_step() != int(state.step):
        mngr.save(int(state.step), state, force=True, metrics=last_val)
    mngr.wait()
    log.info(f"done at step {int(state.step)}")


if __name__ == "__main__":
    main()
