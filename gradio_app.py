"""Gradio demo entry point (reference gradio_app.py equivalent).

  python gradio_app.py --res 320_512 --ckpt_path model.ckpt
  python gradio_app.py --res 256_256 --random_init   # weight-free smoke
"""
import argparse

from dynamicrafter_tpu.app import launch_app

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=str, default="320_512",
                        choices=["256_256", "320_512", "576_1024"])
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--random_init", action="store_true")
    parser.add_argument("--share", action="store_true")
    parser.add_argument("--compile_cache_dir", type=str, default=None,
                        help="persistent XLA compile cache: app restarts "
                             "skip the UNet compile (utils/compile_cache.py)")
    args = parser.parse_args()
    if args.compile_cache_dir:
        from dynamicrafter_tpu.utils.compile_cache import enable
        enable(args.compile_cache_dir)
    launch_app(resolution=args.res, ckpt_path=args.ckpt_path,
               random_init=args.random_init, share=args.share)
