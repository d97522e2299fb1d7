"""Training observability: metrics logging + periodic sample logging.

Replaces the reference's TensorBoard/CSV loggers + ImageLogger callback
(main/utils_train.py:99-123, main/callbacks.py:15-101) and the CUDACallback
timing (callbacks.py:104-133) with a host-side MetricLogger (CSV always,
TensorBoard when available) and a SampleLogger that runs the full DDIM
sampler every N steps and writes mp4s.
"""
from __future__ import annotations

import csv
import logging
import os
import time
from typing import Dict, Optional

import numpy as np

mainlogger = logging.getLogger("mainlogger")


def setup_logger(logdir: str) -> logging.Logger:
    """File + console logger (main/utils_train.py:162-173)."""
    os.makedirs(logdir, exist_ok=True)
    if not mainlogger.handlers:
        mainlogger.setLevel(logging.INFO)
        fh = logging.FileHandler(os.path.join(logdir, "train.log"))
        sh = logging.StreamHandler()
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        fh.setFormatter(fmt)
        sh.setFormatter(fmt)
        mainlogger.addHandler(fh)
        mainlogger.addHandler(sh)
    return mainlogger


class MetricLogger:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._csv_path = os.path.join(logdir, "metrics.csv")
        self._csv_file = open(self._csv_path, "a", newline="")
        self._csv = None
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter  # type: ignore
                self._tb = SummaryWriter(logdir)
            except ImportError:
                try:
                    import tensorflow as tf  # type: ignore
                    self._tb = tf.summary.create_file_writer(logdir)
                    self._tb_is_tf = True
                except ImportError:
                    self._tb = None
        self._tb_is_tf = getattr(self, "_tb_is_tf", False)
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        metrics = dict(metrics)
        metrics.update(self.device_memory_stats())
        row = {"step": step, "wall_s": round(time.time() - self._t0, 2),
               **{k: float(v) for k, v in metrics.items()}}
        if self._csv is None or any(k not in self._csv.fieldnames for k in row):
            # new metric keys can appear later (e.g. val/* rows between train
            # rows) — restart the writer with the union of fields and rewrite
            # the file so the header stays correct
            old_fields = list(self._csv.fieldnames) if self._csv else []
            fields = old_fields + [k for k in row if k not in old_fields]
            if old_fields and self._csv_file.tell() > 0:
                self._csv_file.close()
                with open(self._csv_path) as f:
                    old_rows = list(csv.DictReader(f))
                self._csv_file = open(self._csv_path, "w", newline="")
                self._csv = csv.DictWriter(self._csv_file, fieldnames=fields,
                                           restval="")
                self._csv.writeheader()
                for r in old_rows:
                    self._csv.writerow(r)
            else:
                self._csv = csv.DictWriter(self._csv_file, fieldnames=fields,
                                           restval="")
                if self._csv_file.tell() == 0:
                    self._csv.writeheader()
        self._csv.writerow(row)
        self._csv_file.flush()
        if self._tb is not None:
            if self._tb_is_tf:
                with self._tb.as_default():
                    import tensorflow as tf
                    for k, v in metrics.items():
                        tf.summary.scalar(k, float(v), step=step)
            else:
                for k, v in metrics.items():
                    self._tb.add_scalar(k, float(v), step)

    @staticmethod
    def device_memory_stats() -> Dict[str, float]:
        """Peak/live device memory (the reference CUDACallback equivalent,
        main/callbacks.py:104-133): `peak_hbm_gb` is the per-process device
        peak; on backends whose memory_stats() is None (CPU) the host peak
        RSS keeps the column populated so the metric surface is identical
        everywhere."""
        out: Dict[str, float] = {}
        try:
            import jax
            stats = jax.local_devices()[0].memory_stats() or {}
            if "bytes_in_use" in stats:
                out["mem_in_use_gb"] = stats["bytes_in_use"] / 1e9
            if "peak_bytes_in_use" in stats:
                out["peak_hbm_gb"] = stats["peak_bytes_in_use"] / 1e9
        except Exception:
            pass
        if "peak_hbm_gb" not in out:
            try:
                import resource
                out["peak_hbm_gb"] = resource.getrusage(
                    resource.RUSAGE_SELF).ru_maxrss / 1e6  # linux: KB
            except Exception:
                pass
        return out

    def close(self):
        self._csv_file.close()


class SampleLogger:
    """ImageLogger equivalent: run full DDIM sampling on a fixed batch every
    `every_n_steps` and save mp4s under <logdir>/samples."""

    def __init__(self, pipe, logdir: str, every_n_steps: int = 500,
                 sample_kwargs: Optional[dict] = None, max_samples: int = 2,
                 fps: int = 8, to_tensorboard: bool = True,
                 log_inputs: bool = True, plot_denoise_rows: bool = False,
                 denoise_log_every_t: int = 10):
        self.pipe = pipe
        self.dir = os.path.join(logdir, "samples")
        os.makedirs(self.dir, exist_ok=True)
        self.every = every_n_steps
        self.kwargs = dict(steps=50, cfg_scale=7.5,
                           timestep_spacing="uniform_trailing",
                           guidance_rescale=0.7)
        self.kwargs.update(sample_kwargs or {})
        self.max_samples = max_samples
        self.fps = fps
        self.log_inputs = log_inputs
        # reference ImageLogger's plot_denoise_rows / log_images["denoise_row"]
        # (main/callbacks.py:57-88, ddpm3d.py:1195-1197) — each DDIM
        # intermediate decoded and tiled into one grid image per sample.
        # Accepted both as a constructor arg and inside log_images_kwargs
        # (the reference passes it through log_images, ddpm3d.py:1131).
        self.plot_denoise_rows = bool(
            self.kwargs.pop("plot_denoise_rows", plot_denoise_rows))
        self.denoise_log_every_t = int(
            self.kwargs.pop("denoise_log_every_t", denoise_log_every_t))
        self._tb = None
        if to_tensorboard:
            try:
                from tensorboardX import SummaryWriter  # type: ignore
                self._tb = SummaryWriter(os.path.join(logdir, "tb_samples"))
            except ImportError:
                self._tb = None

    def maybe_log(self, step: int, batch: Dict) -> None:
        if step % self.every != 0:
            return
        from dynamicrafter_tpu.utils.video import save_video

        videos = np.asarray(batch["video"])[: self.max_samples]
        prompts = list(batch.get("captions", [""] * len(videos)))[: self.max_samples]
        kwargs = dict(self.kwargs)
        if self.plot_denoise_rows:
            kwargs["log_every_t"] = self.denoise_log_every_t
        out = self.pipe.sample(prompts, videos,
                               fs=[int(x) for x in
                                   np.asarray(batch["fs"])[: self.max_samples]],
                               **kwargs)
        for i in range(out.videos.shape[0]):
            save_video(out.videos[i, 0],
                       os.path.join(self.dir, f"step{step:07d}_{i}.mp4"),
                       fps=self.fps)
        if out.denoise_rows is not None:
            from dynamicrafter_tpu.utils.video import (
                make_denoise_grid, save_image,
            )

            # denoise_rows: (n_logs+1, B, T, H, W, 3) -> one grid per sample
            for i in range(out.denoise_rows.shape[1]):
                save_image(
                    make_denoise_grid(out.denoise_rows[:, i]),
                    os.path.join(self.dir,
                                 f"step{step:07d}_{i}_denoise_row.png"))
        if self.log_inputs:
            # input + VAE-reconstruction rows, like the reference's
            # log_images "reconst"/"image_condition" keys
            # (main/callbacks.py:57-88, lvdm/models/ddpm3d.py:1149-1155)
            import jax.random as jrandom
            z = self.pipe.encode_video(videos, jrandom.PRNGKey(0))
            reconst = np.asarray(self.pipe.decode_latents(z))
            for i in range(len(videos)):
                save_video(videos[i], os.path.join(
                    self.dir, f"step{step:07d}_{i}_input.mp4"), fps=self.fps)
                save_video(reconst[i], os.path.join(
                    self.dir, f"step{step:07d}_{i}_reconst.mp4"), fps=self.fps)
        if self._tb is not None:
            # TensorBoard video summary (reference main/callbacks.py:31-55):
            # (N, T, C, H, W) uint8
            vids = np.clip((out.videos[:, 0] + 1.0) / 2.0, 0, 1)
            vids = (vids * 255).astype(np.uint8).transpose(0, 1, 4, 2, 3)
            self._tb.add_video("samples", vids, global_step=step,
                               fps=self.fps)
            self._tb.flush()
        mainlogger.info(f"[SampleLogger] wrote {out.videos.shape[0]} samples "
                        f"at step {step}")
