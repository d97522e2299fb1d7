"""Serving layer: Image2Video backend + gradio UI.

Behavioral parity targets:
  * Image2Video backend        scripts/gradio/i2v_test.py:13-102
  * interp/loop backend        scripts/gradio/i2v_test_application.py:13-126
    (loop mode drops the last frame, :104-105)
  * per-resolution UI defaults gradio_app.py:38-181

The backend is framework-native and testable without gradio; `launch_app`
builds the UI when gradio is importable.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

RESOLUTIONS = {
    "256_256": dict(height=256, width=256, fs=3, fs_min=1, fs_max=6,
                    config="configs/inference_256_v1.0.yaml",
                    timestep_spacing="uniform", guidance_rescale=0.0),
    "320_512": dict(height=320, width=512, fs=24, fs_min=15, fs_max=30,
                    config="configs/inference_512_v1.0.yaml",
                    timestep_spacing="uniform_trailing", guidance_rescale=0.7),
    "576_1024": dict(height=576, width=1024, fs=10, fs_min=5, fs_max=20,
                     config="configs/inference_1024_v1.0.yaml",
                     timestep_spacing="uniform_trailing", guidance_rescale=0.7),
}


class Image2Video:
    """Generation backend shared by the gradio UI and programmatic callers."""

    def __init__(self, result_dir: str = "./gradio_results",
                 resolution: str = "320_512",
                 ckpt_path: Optional[str] = None,
                 random_init: bool = False,
                 mode: str = "i2v"):
        import jax.numpy as jnp

        from dynamicrafter_tpu.config import ModelConfig
        from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline

        assert resolution in RESOLUTIONS, f"unknown resolution {resolution}"
        assert mode in ("i2v", "interp", "loop")
        self.spec = RESOLUTIONS[resolution]
        self.mode = mode
        self.result_dir = result_dir
        os.makedirs(result_dir, exist_ok=True)

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg_path = os.path.join(repo_root, self.spec["config"])
        if ckpt_path is None and not random_init:
            # reference gradio backend auto-downloads the released weights
            # (scripts/gradio/i2v_test.py:20-29; the interp/loop tabs use the
            # 512_interp checkpoint, i2v_test_application.py:20-28); fall back
            # to random init when the hub is unreachable so the demo comes up
            from dynamicrafter_tpu.utils.video import download_checkpoint
            res = resolution.split("_")[-1]
            if mode in ("interp", "loop"):
                res = f"{res}_interp"
            try:
                ckpt_path = download_checkpoint(res)
            except Exception as e:  # no egress / no hub package
                print(f"WARNING: checkpoint download failed ({e}); "
                      "running with random-init weights (smoke mode)")
                random_init = True
        if ckpt_path and not random_init:
            self.pipe = DynamiCrafterPipeline.from_checkpoint(
                cfg_path, ckpt_path, dtype=jnp.bfloat16)
        else:
            self.pipe = DynamiCrafterPipeline(ModelConfig.from_yaml(cfg_path),
                                              dtype=jnp.bfloat16)
            h, w = self.spec["height"] // 8, self.spec["width"] // 8
            self.pipe.init_random(latent_hw=(h, w))

    def get_image(self, image: np.ndarray, prompt: str, steps: int = 50,
                  cfg_scale: float = 7.5, eta: float = 1.0, fs: int = None,
                  seed: int = 123, image2: Optional[np.ndarray] = None,
                  deepcache: int = 1, sampler: str = "ddim") -> str:
        """image: (H, W, 3) uint8 or float [-1,1]; returns mp4 path."""
        from dynamicrafter_tpu.utils.video import save_video

        spec = self.spec
        fs = spec["fs"] if fs is None else fs  # `or` would swallow fs=0
        t = self.pipe.unet_config.temporal_length or 16
        if sampler != "ddim":
            deepcache = 1  # DeepCache is certified on DDIM only
        if deepcache > 1 and steps % deepcache != 0:
            # UI affordance: snap to the largest divisor of steps <= the
            # requested interval (the pipeline itself is strict)
            deepcache = max(d for d in range(1, deepcache + 1)
                            if steps % d == 0)

        def prep(img):
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 255.0 * 2 - 1
            return _resize_center_crop_f(img, (spec["height"], spec["width"]))

        img = prep(image)
        if self.mode in ("interp", "loop") and image2 is not None:
            img2 = prep(image2)
            half = t // 2
            video = np.stack([img] * half + [img2] * (t - half))[None]
        else:
            video = np.stack([img] * t)[None]

        out = self.pipe.sample(
            [prompt], video, steps=steps, cfg_scale=cfg_scale, eta=eta,
            timestep_spacing=spec["timestep_spacing"],
            guidance_rescale=spec["guidance_rescale"], fs=[fs], seed=seed,
            loop_or_interp=self.mode in ("interp", "loop"),
            deepcache=deepcache,
            sampler=sampler,
        )
        frames = out.videos[0, 0]
        if self.mode == "loop":
            frames = frames[:-1]  # i2v_test_application.py:104-105
        name = f"{prompt[:40].replace(' ', '_') or 'sample'}_{int(time.time())}.mp4"
        path = os.path.join(self.result_dir, name)
        save_video(frames, path, fps=8)
        return path


def _resize_center_crop_f(img: np.ndarray, size) -> np.ndarray:
    import cv2

    th, tw = size
    h, w, _ = img.shape
    scale = max(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top, left = (nh - th) // 2, (nw - tw) // 2
    return img[top:top + th, left:left + tw]


def _example_rows(resolution: str):
    """Example rows [image, prompt, steps, cfg, eta, fs, seed] from the
    repo prompt assets (reference gradio_app.py:8-34 ships per-resolution
    example tables; we derive them from prompts/<res>/)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res_dir = resolution.split("_")[-1]
    d = os.path.join(repo_root, "prompts", res_dir)
    spec = RESOLUTIONS[resolution]
    rows = []
    if os.path.isdir(d):
        for fn in sorted(os.listdir(d)):
            if fn.lower().endswith((".png", ".jpg", ".jpeg")):
                stem = os.path.splitext(fn)[0]
                txt = os.path.join(d, stem + ".txt")
                if os.path.exists(txt):
                    prompt = open(txt).read().strip()
                else:
                    pf = os.path.join(d, "prompts.txt")
                    prompt = (open(pf).read().strip().splitlines() or [""])[0] \
                        if os.path.exists(pf) else ""
                rows.append([os.path.join(d, fn), prompt, 50, 7.5, 1.0,
                             spec["fs"], 123])
    return rows


def launch_app(resolution: str = "320_512", ckpt_path: Optional[str] = None,
               random_init: bool = False, gr_module=None, launch: bool = True,
               **launch_kwargs):
    """Build + launch the gradio demo.

    Reference surface: gradio_app.py:38-181 (per-resolution i2v tab with
    Examples + random-seed button) plus the interp/loop application backends
    (scripts/gradio/i2v_test_application.py) exposed as two more tabs.
    gr_module/launch exist for UI-construction tests without gradio.
    """
    if gr_module is None:
        try:
            import gradio as gr_module
        except ImportError as e:
            raise ImportError(
                "gradio is not installed in this environment; the "
                "Image2Video backend remains usable programmatically") from e
    gr = gr_module

    spec = RESOLUTIONS[resolution]
    backends = {}

    def get_backend(mode):
        if mode not in backends:
            backends[mode] = Image2Video(resolution=resolution,
                                         ckpt_path=ckpt_path,
                                         random_init=random_init, mode=mode)
        return backends[mode]

    max_seed = 2 ** 31
    motion_label = ("FPS" if resolution == "576_1024" else
                    "Motion magnitude" if resolution == "256_256" else "FPS")

    def build_controls():
        prompt = gr.Textbox(label="Prompts")
        with gr.Row():
            eta = gr.Slider(0.0, 1.0, value=1.0, step=0.1, label="ETA")
            cfg = gr.Slider(1.0, 15.0, value=7.5, step=0.5, label="CFG Scale")
        with gr.Row():
            steps = gr.Slider(1, 60, value=50, step=1, label="Sampling steps")
            fs = gr.Slider(spec["fs_min"], spec["fs_max"], value=spec["fs"],
                           step=1, label=motion_label)
        with gr.Row():
            seed = gr.Slider(0, max_seed, value=123, step=1,
                             label="Random Seed")
            rnd = gr.Button("\U0001f3b2️")
        deepcache = gr.Slider(1, 10, value=1, step=1,
                              label="DeepCache interval (1 = off; N>1 "
                                    "reuses deep UNet features for faster, "
                                    "slightly approximate sampling)")
        sampler = gr.Radio(["ddim", "dpm", "unipc"], value="ddim",
                           label="Sampler (dpm = DPM-Solver++(2M), DDIM-50 "
                                 "quality at ~30 steps; unipc = low-NFE "
                                 "predictor-corrector for <=20 steps; both "
                                 "deterministic — ETA ignored, DeepCache "
                                 "disabled)")
        import random as _random
        rnd.click(fn=lambda: _random.randint(0, max_seed), outputs=seed,
                  queue=False)
        return prompt, steps, cfg, eta, fs, seed, deepcache, sampler

    h, w = spec["height"], spec["width"]
    with gr.Blocks() as demo:
        gr.Markdown("## DynamiCrafter-TPU — animating open-domain images "
                    "with video diffusion priors")

        with gr.Tab(label=f"Image2Video_{h}x{w}"):
            with gr.Row():
                with gr.Column():
                    image = gr.Image(label="Input Image")
                    (prompt, steps, cfg, eta, fs, seed,
                     deepcache, sampler) = build_controls()
                    go = gr.Button("Generate")
                with gr.Column():
                    video = gr.Video(label="Generated Video", autoplay=True)
            examples = _example_rows(resolution)
            if examples:
                gr.Examples(examples=examples,
                            inputs=[image, prompt, steps, cfg, eta, fs, seed],
                            outputs=[video],
                            fn=lambda *a: _run(get_backend("i2v"), *a),
                            cache_examples=False)
            go.click(lambda *a: _run(get_backend("i2v"), *a),
                     inputs=[image, prompt, steps, cfg, eta, fs, seed,
                             deepcache, sampler],
                     outputs=[video])

        with gr.Tab(label=f"Interpolation_{h}x{w}"):
            with gr.Row():
                with gr.Column():
                    image_a = gr.Image(label="First Frame")
                    image_b = gr.Image(label="Last Frame")
                    (prompt2, steps2, cfg2, eta2, fs2, seed2,
                     deepcache2, sampler2) = build_controls()
                    go2 = gr.Button("Generate")
                with gr.Column():
                    video2 = gr.Video(label="Generated Video", autoplay=True)
            go2.click(lambda im, im2, *a: _run(get_backend("interp"), im, *a,
                                               image2=im2),
                      inputs=[image_a, image_b, prompt2, steps2, cfg2, eta2,
                              fs2, seed2, deepcache2, sampler2],
                      outputs=[video2])

        with gr.Tab(label=f"Looping_{h}x{w}"):
            with gr.Row():
                with gr.Column():
                    image3 = gr.Image(label="Input Image")
                    (prompt3, steps3, cfg3, eta3, fs3, seed3,
                     deepcache3, sampler3) = build_controls()
                    go3 = gr.Button("Generate")
                with gr.Column():
                    video3 = gr.Video(label="Generated Video", autoplay=True)
            # loop mode: first frame is also the last (drop-last on output,
            # i2v_test_application.py:104-105)
            go3.click(lambda im, *a: _run(get_backend("loop"), im, *a,
                                          image2=im),
                      inputs=[image3, prompt3, steps3, cfg3, eta3, fs3, seed3,
                              deepcache3, sampler3],
                      outputs=[video3])

    if not launch:
        return demo
    return demo.launch(**launch_kwargs)


def _run(backend, image, prompt, steps, cfg, eta, fs, seed, deepcache=1,
         sampler="ddim", image2=None):
    return backend.get_image(image, prompt, int(steps), float(cfg),
                             float(eta), int(fs), int(seed), image2=image2,
                             deepcache=int(deepcache), sampler=str(sampler))
