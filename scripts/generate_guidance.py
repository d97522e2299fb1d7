"""SDS-guidance generation CLI.

Mirrors the fork's generate_dynamicrafter_pipeline.py surface (:81-155):
optimize latents by score distillation instead of DDIM sampling. Two input
modes: the reference's single-sample --prompt + --condition_image, or a
--prompt_dir of image/.txt pairs (this repo's batch extension). Auto
frame-stride per resolution (256->3, 512->24, 1024->10, :102-103).

Reference-compat notes baked into the flags below:
  * --min/max_step_ratio_end are parsed but never consumed by the
    reference (no annealing exists anywhere in the repo) — accepted here,
    warned about if they differ from the _start values, which ARE used.
  * --eta / --output_type / --device are accepted no-ops: SDS has no
    stochastic DDIM step, outputs are always mp4 + loss .npy, and JAX
    picks devices via JAX_PLATFORMS.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

AUTO_FS = {256: 3, 512: 24, 1024: 10}
RESOLUTIONS = {"256_256": (256, 256), "320_512": (320, 512),
               "576_1024": (576, 1024)}


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--ckpt_path", type=str, default=None)
    src = p.add_argument_group("inputs (one of)")
    src.add_argument("--prompt_dir", type=str, default=None,
                     help="dir of image + same-stem .txt prompt pairs")
    src.add_argument("--prompt", type=str, default=None,
                     help="single text prompt (reference mode, :86-88)")
    src.add_argument("--condition_image", type=str, default=None,
                     help="condition image for --prompt (:89-91)")
    p.add_argument("--savedir", "--output_dir", "--results_dir",
                   dest="savedir", type=str, default="results_guidance")
    p.add_argument("--resolution", type=str, default=None,
                   choices=sorted(RESOLUTIONS),
                   help="sets --height/--width (:98-99)")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--video_length", "--num_frames", dest="video_length",
                   type=int, default=16)
    p.add_argument("--num_steps", "--num_optimization_steps",
                   dest="num_steps", type=int, default=1000)
    p.add_argument("--lr", "--learning_rate", dest="lr", type=float,
                   default=0.01)
    p.add_argument("--cfg_scale", "--guidance_scale", dest="cfg_scale",
                   type=float, default=7.5)
    p.add_argument("--loss_type", type=str, default="sds",
                   choices=["sds", "csd", "rfds"],
                   help="alias for a default weight_type: sds->t, csd->ada, "
                        "rfds->uniform (reference "
                        "generate_dynamicrafter_pipeline.py:221-228)")
    p.add_argument("--weight_type", type=str, default="auto",
                   choices=["auto", "t", "ada", "uniform"])
    p.add_argument("--optimizer_type", type=str, default="AdamW",
                   choices=["AdamW", "Adam"],
                   help="reference betas: AdamW (0.9,0.99), Adam (0.9,0.999) "
                        "(guidance_pipeline.py:769-774)")
    p.add_argument("--negative_prompt", type=str, default=None,
                   help="uncond text for the CFG branch (:152-153)")
    p.add_argument("--min_step_ratio_start", type=float, default=0.02)
    p.add_argument("--min_step_ratio_end", type=float, default=None,
                   help="parsed-but-unused in the reference; accepted only")
    p.add_argument("--max_step_ratio_start", type=float, default=0.98)
    p.add_argument("--max_step_ratio_end", type=float, default=None,
                   help="parsed-but-unused in the reference; accepted only")
    p.add_argument("--frame_stride", type=int, default=None)
    p.add_argument("--eta", type=float, default=1.0,
                   help="accepted for compatibility (:107-108); the SDS loop "
                        "has no stochastic DDIM step to apply it to")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--savefps", type=int, default=10)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--debug_dir", type=str, default=None,
                   help="write per-interval debug dumps (step videos/frames, "
                        "optimization_process.mp4, loss analysis) here — "
                        "reference guidance_pipeline.py:527-751")
    p.add_argument("--save_results", action="store_true",
                   help="reference enhanced saving (:135-137): enables the "
                        "debug dumps under <savedir>/debug if --debug_dir "
                        "is unset")
    p.add_argument("--save_debug_images", action="store_true")
    p.add_argument("--save_debug_videos", action="store_true")
    p.add_argument("--save_process_video", action="store_true")
    p.add_argument("--debug_save_interval", type=int, default=None,
                   help="debug dump every N optimization steps (:146-147); "
                        "also the jitted chunk length (SDSSettings.log_every)")
    p.add_argument("--output_type", type=str, default="tensor",
                   choices=["tensor", "numpy"],
                   help="accepted for compatibility; outputs are mp4 + .npy")
    p.add_argument("--device", type=str, default=None,
                   help="accepted for compatibility; set JAX_PLATFORMS instead")
    return p


def main():
    args = get_parser().parse_args()

    import numpy as np

    import jax.numpy as jnp

    from dynamicrafter_tpu.config import ModelConfig
    from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline
    from dynamicrafter_tpu.sds import SDSGuidancePipeline, SDSSettings
    from dynamicrafter_tpu.utils.video import (
        load_image, load_prompt_dir, save_results_separate,
    )

    if args.resolution:
        args.height, args.width = RESOLUTIONS[args.resolution]
    if not args.prompt_dir and not (args.prompt and args.condition_image):
        raise SystemExit("need --prompt_dir, or --prompt + --condition_image")
    for nm in ("min", "max"):
        end = getattr(args, f"{nm}_step_ratio_end")
        start = getattr(args, f"{nm}_step_ratio_start")
        if end is not None and end != start:
            print(f"WARNING: --{nm}_step_ratio_end={end} accepted but unused "
                  f"(dead flag in the reference too); using _start={start}")
    if args.device:
        print("WARNING: --device is a no-op under JAX; set JAX_PLATFORMS")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.ckpt_path and not args.random_init:
        pipe = DynamiCrafterPipeline.from_checkpoint(
            args.config, args.ckpt_path, dtype=dtype)
    else:
        pipe = DynamiCrafterPipeline(ModelConfig.from_yaml(args.config),
                                     dtype=dtype)
        f = 2 ** (len(pipe.vae_config.ch_mult) - 1)
        pipe.init_random(latent_hw=(args.height // f, args.width // f))
        print("WARNING: random-init weights — smoke run only")

    fs = (AUTO_FS.get(args.width, 24) if args.frame_stride is None
          else args.frame_stride)
    if args.weight_type == "auto":
        # loss_type only remaps to a weight type in the reference too
        # (generate_dynamicrafter_pipeline.py:221-228)
        weight_type = {"sds": "t", "csd": "ada", "rfds": "uniform"}[args.loss_type]
    else:
        weight_type = args.weight_type
    hi_res = args.width in (512, 1024)
    settings = SDSSettings(
        num_steps=args.num_steps, lr=args.lr, cfg_scale=args.cfg_scale,
        guidance_rescale=0.7 if hi_res else 0.0,
        weight_type=weight_type,
        min_step_ratio=args.min_step_ratio_start,
        max_step_ratio=args.max_step_ratio_start,
        timestep_spacing="uniform_trailing" if hi_res else "uniform",
        optimizer_type=args.optimizer_type,
        negative_prompt=args.negative_prompt or "",
    )
    if args.debug_save_interval:
        import dataclasses
        settings = dataclasses.replace(settings,
                                       log_every=args.debug_save_interval)
    sds = SDSGuidancePipeline(pipe, settings)

    debug_dir = args.debug_dir
    if debug_dir is None and (args.save_results or args.save_debug_images
                              or args.save_debug_videos
                              or args.save_process_video):
        debug_dir = os.path.join(args.savedir, "debug")

    if args.prompt_dir:
        names, videos, prompts = load_prompt_dir(
            args.prompt_dir, video_size=(args.height, args.width),
            video_frames=args.video_length)
    else:
        img = load_image(args.condition_image, (args.height, args.width))
        videos = np.repeat(img[None, None], args.video_length, axis=1)
        names = [os.path.basename(args.condition_image)]
        prompts = [args.prompt]

    os.makedirs(args.savedir, exist_ok=True)
    for i, (name, prompt) in enumerate(zip(names, prompts)):
        out = sds([prompt], videos[i:i + 1], seed=args.seed, fs=[fs],
                  debug_dir=(os.path.join(debug_dir,
                                          os.path.splitext(name)[0])
                             if debug_dir else None))
        assert np.all(np.isfinite(out["videos"])), "NaN in generated video"
        save_results_separate(out["videos"][:, None], [name], args.savedir,
                              fps=args.savefps)
        np.save(os.path.join(
            args.savedir, os.path.splitext(name)[0] + "_loss.npy"),
            out["loss_curve"])
        print(f"[{i+1}/{len(prompts)}] {name}: "
              f"final loss {out['loss_curve'][-1]:.5f}")


if __name__ == "__main__":
    main()
