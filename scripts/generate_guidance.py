"""SDS-guidance generation CLI.

Mirrors the fork's generate_dynamicrafter_pipeline.py surface
(:40-50, 81-155): optimize latents by score distillation instead of DDIM
sampling; auto frame-stride per resolution (256->3, 512->24, 1024->10).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

AUTO_FS = {256: 3, 512: 24, 1024: 10}


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--prompt_dir", type=str, required=True)
    p.add_argument("--savedir", type=str, default="results_guidance")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--num_steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--loss_type", type=str, default="sds",
                   choices=["sds", "csd", "rfds"],
                   help="alias for a default weight_type: sds->t, csd->ada, "
                        "rfds->uniform (reference "
                        "generate_dynamicrafter_pipeline.py:221-228)")
    p.add_argument("--weight_type", type=str, default="auto",
                   choices=["auto", "t", "ada", "uniform"])
    p.add_argument("--frame_stride", type=int, default=None)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--savefps", type=int, default=10)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--debug_dir", type=str, default=None,
                   help="write per-interval debug dumps (step videos/frames, "
                        "optimization_process.mp4, loss analysis) here — "
                        "reference guidance_pipeline.py:527-751")
    return p


def main():
    args = get_parser().parse_args()

    import jax.numpy as jnp

    from dynamicrafter_tpu.config import ModelConfig
    from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline
    from dynamicrafter_tpu.sds import SDSGuidancePipeline, SDSSettings
    from dynamicrafter_tpu.utils.video import load_prompt_dir, save_results_separate

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
    sds = SDSGuidancePipeline(pipe, SDSSettings(
        num_steps=args.num_steps, lr=args.lr, cfg_scale=args.cfg_scale,
        guidance_rescale=0.7 if hi_res else 0.0,
        weight_type=weight_type,
        timestep_spacing="uniform_trailing" if hi_res else "uniform",
    ))

    names, videos, prompts = load_prompt_dir(
        args.prompt_dir, video_size=(args.height, args.width),
        video_frames=args.video_length)
    os.makedirs(args.savedir, exist_ok=True)
    for i, (name, prompt) in enumerate(zip(names, prompts)):
        out = sds([prompt], videos[i:i + 1], seed=args.seed, fs=[fs],
                  debug_dir=(os.path.join(args.debug_dir,
                                          os.path.splitext(name)[0])
                             if args.debug_dir else None))
        import numpy as np
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
