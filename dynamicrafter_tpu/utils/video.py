"""Image/video IO: prompt-dir loading and mp4 writing.

Behavioral parity targets:
  * prompt-dir convention (images + one .txt of prompts, interp pairs)
    scripts/evaluation/inference.py:71-113
  * resize-shortest-side + center-crop preprocessing (torchvision semantics)
  * mp4 writers  scripts/evaluation/funcs.py:206-218, utils/save_video.py
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


IMG_EXTS = (".jpg", ".jpeg", ".png", ".JPG", ".JPEG", ".PNG")


def load_image(path: str, video_size: Tuple[int, int]) -> np.ndarray:
    """-> (H, W, 3) float32 in [-1, 1], resize shortest side + center crop."""
    assert Image is not None, "Pillow required for image loading"
    img = Image.open(path).convert("RGB")
    th, tw = video_size
    short = min(th, tw)
    w, h = img.size
    scale = short / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
    w, h = img.size
    left = (w - tw) // 2
    top = (h - th) // 2
    img = img.crop((left, top, left + tw, top + th))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def load_prompt_dir(
    data_dir: str,
    video_size: Tuple[int, int] = (256, 256),
    video_frames: int = 16,
    interp: bool = False,
):
    """Returns (filenames, videos (N,T,H,W,3) [-1,1], prompts).

    Mirrors inference.py:71-113: one sorted .txt holds prompts (one/line);
    images sorted by name pair with prompts (2 per prompt when interp).
    """
    files = sorted(os.listdir(data_dir))
    txts = [f for f in files if f.endswith(".txt")]
    assert txts, f"no prompt .txt found in {data_dir}"
    with open(os.path.join(data_dir, txts[0])) as f:
        prompts = [line.strip() for line in f if line.strip()]
    images = [f for f in files if f.endswith(IMG_EXTS)]
    videos, names = [], []
    for i, prompt in enumerate(prompts):
        if interp:
            img1 = load_image(os.path.join(data_dir, images[2 * i]), video_size)
            img2 = load_image(os.path.join(data_dir, images[2 * i + 1]), video_size)
            half = video_frames // 2
            vid = np.stack([img1] * half + [img2] * (video_frames - half))
            names.append(images[2 * i])
        else:
            img = load_image(os.path.join(data_dir, images[i]), video_size)
            vid = np.stack([img] * video_frames)
            names.append(images[i])
        videos.append(vid)
    return names, np.stack(videos), prompts


def to_uint8(frames: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8. NaN-safe: non-finite pixels (possible in
    denoise-row intermediates from early, near-pure-noise latents) clamp
    instead of casting undefined values."""
    frames = np.nan_to_num(frames, nan=-1.0, posinf=1.0, neginf=-1.0)
    return np.clip((frames + 1.0) / 2.0 * 255.0 + 0.5, 0, 255).astype(np.uint8)


def save_video(frames: np.ndarray, path: str, fps: int = 8) -> None:
    """frames: (T, H, W, 3) float [-1,1] or uint8 -> mp4."""
    import cv2

    if frames.dtype != np.uint8:
        frames = to_uint8(frames)
    t, h, w, _ = frames.shape
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    try:
        for frame in frames:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    finally:
        writer.release()


def save_video_grid(
    videos: np.ndarray,                 # (N, T, H, W, 3) float [-1,1]
    path: str,
    fps: int = 8,
    n_cols: Optional[int] = None,
) -> None:
    """Tile N clips into one grid mp4 (utils/save_video.py tensor_to_mp4
    equivalent)."""
    n, t, h, w, c = videos.shape
    cols = n_cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    pad = rows * cols - n
    if pad:
        videos = np.concatenate(
            [videos, -np.ones((pad, t, h, w, c), videos.dtype)], axis=0)
    grid = videos.reshape(rows, cols, t, h, w, c)
    grid = grid.transpose(2, 0, 3, 1, 4, 5).reshape(t, rows * h, cols * w, c)
    save_video(grid, path, fps=fps)


def make_denoise_grid(rows: np.ndarray) -> np.ndarray:
    """(n_logs, T, H, W, 3) decoded denoise intermediates -> one grid image
    (n_logs*H, T*W, 3): one row per logged step, frames left to right — the
    video layout of the reference's _get_denoise_row_from_list
    (lvdm/models/ddpm3d.py:806-817, 'n c t h w -> (n t) c h w' +
    make_grid(nrow=video_length))."""
    n, t, h, w, c = rows.shape
    return rows.transpose(0, 2, 1, 3, 4).reshape(n * h, t * w, c)


def save_image(image: np.ndarray, path: str) -> None:
    """image: (H, W, 3) float [-1,1] or uint8 -> PNG."""
    from PIL import Image

    if image.dtype != np.uint8:
        image = to_uint8(image)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(image).save(path)


def download_checkpoint(resolution: str = "512",
                        cache_dir: str = "./checkpoints") -> str:
    """Fetch a released checkpoint from the HF hub
    (scripts/gradio/i2v_test.py:94-102 equivalent). Requires network."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise ImportError("huggingface_hub required to download weights") from e
    repos = {
        "256": "Doubiiu/DynamiCrafter",
        "512": "Doubiiu/DynamiCrafter_512",
        "1024": "Doubiiu/DynamiCrafter_1024",
        "512_interp": "Doubiiu/DynamiCrafter_512_Interp",
    }
    if resolution not in repos:
        raise ValueError(
            f"no released checkpoint for {resolution!r} (available: "
            f"{sorted(repos)}; interpolation/looping weights exist only "
            "at 512)")
    repo = repos[resolution]
    return hf_hub_download(repo_id=repo, filename="model.ckpt",
                           cache_dir=cache_dir)


def save_results_separate(
    videos: np.ndarray,                # (B, n_samples, T, H, W, 3) [-1,1]
    filenames: Sequence[str],
    savedir: str,
    fps: int = 8,
) -> List[str]:
    """Per-sample mp4s, mirroring save_results_seperate (inference.py:142-162)."""
    paths = []
    os.makedirs(savedir, exist_ok=True)
    for b in range(videos.shape[0]):
        stem = os.path.splitext(os.path.basename(filenames[b]))[0]
        for k in range(videos.shape[1]):
            suffix = f"_sample{k}" if videos.shape[1] > 1 else ""
            path = os.path.join(savedir, f"{stem}{suffix}.mp4")
            save_video(videos[b, k], path, fps=fps)
            paths.append(path)
    return paths
