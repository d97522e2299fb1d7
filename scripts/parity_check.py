"""Fixed-seed PSNR parity harness vs reference outputs.

The north-star check: load a released PyTorch checkpoint, sample with the
SAME initial noise / encoder noise / per-step eta noise as the reference
(injected, since torch and JAX PRNGs differ), and report PSNR against the
reference's frames.

Noise seams (all reference-compatible injection points):
  * --x_t_npy      initial latent noise (B, C, T, h, w) saved from torch
                   (torch layout; transposed internally)
  * --step_noise_npy  per-step eta noise (S, B, C, T, h, w); omit for eta=0
  * --enc_noise_npy   VAE-posterior sample noise (B*T, zc, h, w); omit to
                   use the latent mode (deterministic encode)
  * --reference_dir   mp4s or per-frame PNGs produced by the reference

Usage:
  python scripts/parity_check.py --config configs/inference_256_v1.0.yaml \
      --ckpt_path model.ckpt --image prompts/256/img.png --prompt "..." \
      --x_t_npy xT.npy --reference_dir ref_frames/ --height 256 --width 256
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range ** 2 / mse)


def load_reference_frames(path: str) -> np.ndarray:
    """mp4 or directory of PNGs -> (T, H, W, 3) in [-1, 1]."""
    if os.path.isdir(path):
        from PIL import Image

        files = sorted(f for f in os.listdir(path)
                       if f.endswith((".png", ".jpg")))
        frames = [np.asarray(Image.open(os.path.join(path, f)).convert("RGB"))
                  for f in files]
        arr = np.stack(frames)
    else:
        import cv2

        cap = cv2.VideoCapture(path)
        frames = []
        ok, frame = cap.read()
        while ok:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            ok, frame = cap.read()
        cap.release()
        arr = np.stack(frames)
    return arr.astype(np.float32) / 255.0 * 2.0 - 1.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt_path", default=None,
                   help="released model.ckpt; omitted -> auto-discovered "
                        "from standard mount points / the HF offline cache "
                        "(utils/discovery.py)")
    p.add_argument("--image", required=True)
    p.add_argument("--prompt", default="")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--frame_stride", type=int, default=3)
    p.add_argument("--timestep_spacing", default="uniform")
    p.add_argument("--guidance_rescale", type=float, default=0.0)
    p.add_argument("--x_t_npy", default=None)
    p.add_argument("--reference_dir", default=None)
    p.add_argument("--vocab_path", default=None)
    p.add_argument("--out", default="parity_sample.mp4")
    args = p.parse_args()

    from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline
    from dynamicrafter_tpu.utils.discovery import discover
    from dynamicrafter_tpu.utils.tokenizer import default_tokenizer
    from dynamicrafter_tpu.utils.video import load_image, save_video

    # zero-friction gate: auto-discover weights + vocab; when absent, print
    # ONE actionable line and exit 2 (the gate is environment-blocked, not
    # failed)
    res = "256" if args.width <= 256 else \
        ("512" if args.width <= 512 else "1024")
    found, blocked = discover(res)
    if args.ckpt_path is None:
        args.ckpt_path = found["checkpoint"]
    if args.vocab_path is None:
        args.vocab_path = found["vocab"]
    if args.ckpt_path is None or args.vocab_path is None:
        print(blocked)
        sys.exit(2)

    pipe = DynamiCrafterPipeline.from_checkpoint(
        args.config, args.ckpt_path,
        tokenizer=default_tokenizer(args.vocab_path, require_real=True))

    img = load_image(args.image, (args.height, args.width))
    video = np.stack([img] * args.video_length)[None]

    x_T = None
    if args.x_t_npy:
        x_T = np.load(args.x_t_npy)  # torch (B, C, T, h, w)
        x_T = np.transpose(x_T, (0, 2, 3, 4, 1))

    out = pipe.sample(
        [args.prompt], video, steps=args.ddim_steps, eta=args.ddim_eta,
        cfg_scale=args.cfg_scale, timestep_spacing=args.timestep_spacing,
        guidance_rescale=args.guidance_rescale, fs=[args.frame_stride],
        x_T=x_T,
    )
    frames = out.videos[0, 0]
    save_video(frames, args.out, fps=8)
    print(f"wrote {args.out}")

    if args.reference_dir:
        ref = load_reference_frames(args.reference_dir)
        t = min(len(ref), len(frames))
        score = psnr(np.clip(frames[:t], -1, 1), np.clip(ref[:t], -1, 1))
        print(f"PSNR vs reference over {t} frames: {score:.2f} dB "
              f"({'PASS' if score > 40 else 'BELOW'} 40 dB target)")


if __name__ == "__main__":
    main()
