"""CLI inference: text+image -> video, over a prompt directory.

Mirrors the reference CLI surface (scripts/evaluation/inference.py:383-413):
same flags, same prompt-dir convention (images + one .txt; interp pairs two
images per prompt), same output layout (one mp4 per prompt).

Run e.g.:
  python scripts/inference.py --config configs/inference_256_v1.0.yaml \
      --ckpt_path model.ckpt --prompt_dir prompts/256 --savedir results/256 \
      --height 256 --width 256 --frame_stride 3
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--savedir", type=str, default="results")
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--prompt_dir", type=str, required=True)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--ddim_eta", type=float, default=1.0)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--frame_stride", type=int, default=3,
                   help="fs conditioning (frame stride / fps by model)")
    p.add_argument("--unconditional_guidance_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--negative_prompt", action="store_true")
    p.add_argument("--negative_prompt_text", type=str, default=
                   "worst quality, blurry, distorted, low resolution",
                   help="uncond text used when --negative_prompt is set "
                        "(functional here; declared-but-unused in the "
                        "reference, inference.py:399)")
    p.add_argument("--text_input", action="store_true")
    p.add_argument("--multiple_cond_cfg", action="store_true")
    p.add_argument("--cfg_img", type=float, default=None)
    p.add_argument("--timestep_spacing", type=str, default="uniform")
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "dpm", "unipc"],
                   help="dpm = DPM-Solver++(2M): deterministic 2nd-order "
                        "solver, DDIM-50-class quality at ~30 steps; "
                        "unipc = UniPC-style predictor-corrector, equal to "
                        "dpm at 30+ steps and measured ~5%% better at <=20 "
                        "(both beyond reference; ignore --ddim_eta)")
    p.add_argument("--solver_order", type=int, default=2, choices=[1, 2, 3],
                   help="unipc only: predictor order (2 = measured best "
                        "under CFG guidance)")
    p.add_argument("--guidance_rescale", type=float, default=0.0)
    p.add_argument("--perframe_ae", action="store_true")
    p.add_argument("--use_fixed_scheduler", action="store_true",
                   help="accepted for reference-CLI compatibility "
                        "(inference.py:408): the fork's NaN-free sigma-table "
                        "patch (dynamicrafter_pipeline.py:21-65) is subsumed "
                        "here — schedule tables are always fp64 with an "
                        "eps-guarded rescale (schedule.py)")
    p.add_argument("--loop", action="store_true")
    p.add_argument("--interp", action="store_true")
    p.add_argument("--savefps", type=int, default=10)
    # TPU-framework extensions
    p.add_argument("--random_init", action="store_true",
                   help="run with random weights (smoke/benchmark, no ckpt)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (TPU fast path)")
    p.add_argument("--dp", type=int, default=1, help="data-parallel mesh axis")
    p.add_argument("--sp", type=int, default=-1, help="sequence mesh axis")
    p.add_argument("--vocab_path", type=str, default=None,
                   help="path to bpe_simple_vocab_16e6.txt.gz")
    p.add_argument("--deepcache", type=int, default=1,
                   help="N>1: reuse the UNet's deep-level features for N-1 "
                        "of every N DDIM steps (DeepCache; ~1.5-2x faster "
                        "sampling, slight quality tradeoff; must divide "
                        "--ddim_steps)")
    p.add_argument("--sequential_cfg", action="store_true",
                   help="run CFG passes serially (lower peak memory; "
                        "for 576x1024 on a single chip)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the first batch")
    p.add_argument("--compile_cache_dir", type=str, default=None,
                   help="persistent XLA compilation cache: later runs with "
                        "the same shapes skip the 20 s-35 min UNet compile "
                        "(utils/compile_cache.py; JAX_COMPILATION_CACHE_DIR "
                        "works too)")
    return p


def main(args=None, prompt_shard=(0, 1)):
    """Run inference over a prompt dir.

    args: pre-parsed namespace (None -> parse sys.argv).
    prompt_shard: (shard_id, num_shards) slice of the prompt list for
        multi-host data-parallel inference (reference inference.py:350-356).
    """
    if args is None:
        args = get_parser().parse_args()
    if args.deepcache > 1 and args.ddim_steps % args.deepcache != 0:
        raise SystemExit(f"--deepcache {args.deepcache} must divide "
                         f"--ddim_steps {args.ddim_steps}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.compile_cache_dir:
        from dynamicrafter_tpu.utils.compile_cache import enable
        enable(args.compile_cache_dir)

    from dynamicrafter_tpu.config import ModelConfig
    from dynamicrafter_tpu.parallel.sharding import create_mesh
    from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline
    from dynamicrafter_tpu.utils.tokenizer import default_tokenizer
    from dynamicrafter_tpu.utils.video import load_prompt_dir, save_results_separate

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    mesh = None
    if len(jax.devices()) > 1:
        mesh = create_mesh(dp=args.dp, sp=args.sp)

    tokenizer = default_tokenizer(args.vocab_path)
    if args.ckpt_path and not args.random_init:
        pipe = DynamiCrafterPipeline.from_checkpoint(
            args.config, args.ckpt_path, dtype=dtype, mesh=mesh,
            tokenizer=tokenizer)
    else:
        cfg = ModelConfig.from_yaml(args.config)
        pipe = DynamiCrafterPipeline(cfg, dtype=dtype, mesh=mesh,
                                     tokenizer=tokenizer)
        f = 2 ** (len(pipe.vae_config.ch_mult) - 1)
        pipe.init_random(latent_hw=(args.height // f, args.width // f))
        print("WARNING: random-init weights (no checkpoint) — smoke run only")

    names, videos, prompts = load_prompt_dir(
        args.prompt_dir, video_size=(args.height, args.width),
        video_frames=args.video_length, interp=args.interp)
    shard_id, num_shards = prompt_shard
    if num_shards > 1:
        per = -(-len(prompts) // num_shards)
        lo = shard_id * per
        hi = min(len(prompts), lo + per)
        names, videos, prompts = names[lo:hi], videos[lo:hi], prompts[lo:hi]
    if not args.text_input:
        prompts = [""] * len(prompts)

    os.makedirs(args.savedir, exist_ok=True)
    start = time.time()
    n = len(prompts)
    profiling = False
    for i0 in range(0, n, args.bs):
        if args.profile_dir and i0 == 0:
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
        sl = slice(i0, min(i0 + args.bs, n))
        batch_videos = videos[sl]
        out = pipe.sample(
            prompts[sl.start:sl.stop],
            batch_videos,
            steps=args.ddim_steps,
            cfg_scale=args.unconditional_guidance_scale,
            cfg_img=args.cfg_img,
            multiple_cond_cfg=args.multiple_cond_cfg,
            eta=args.ddim_eta,
            timestep_spacing=args.timestep_spacing,
            guidance_rescale=args.guidance_rescale,
            fs=[args.frame_stride] * batch_videos.shape[0],
            loop_or_interp=args.loop or args.interp,
            n_samples=args.n_samples,
            seed=args.seed,
            negative_prompt=(args.negative_prompt_text
                             if args.negative_prompt else ""),
            sequential_cfg=args.sequential_cfg or args.width >= 1024,
            deepcache=args.deepcache,
            sampler=args.sampler,
            solver_order=args.solver_order,
        )
        vids = out.videos
        if args.loop:
            vids = vids[:, :, :-1]  # drop last frame (i2v_test_application.py:104-105)
        save_results_separate(vids, names[sl.start:sl.stop], args.savedir,
                              fps=args.savefps)
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            print(f"profiler trace -> {args.profile_dir}")
        print(f"[{sl.stop}/{n}] elapsed {time.time() - start:.1f}s")
    print(f"done in {time.time() - start:.1f}s -> {args.savedir}")


if __name__ == "__main__":
    main()
