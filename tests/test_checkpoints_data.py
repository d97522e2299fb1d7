"""Checkpoint save/restore + data pipeline + train CLI smoke tests."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamicrafter_tpu.data.webvid import (
    DataLoader, SyntheticVideoDataset, WebVidDataset, _resize_center_crop,
)
from dynamicrafter_tpu.training.checkpoints import (
    CheckpointManager, load_params, save_params,
)
from dynamicrafter_tpu.utils.tokenizer import HashTokenizer


def test_params_save_load(tmp_path):
    params = {"a": {"kernel": jnp.arange(6.0).reshape(2, 3)},
              "b": jnp.ones((4,))}
    path = str(tmp_path / "params")
    save_params(path, params)
    loaded = load_params(path, params)
    np.testing.assert_array_equal(np.asarray(loaded["a"]["kernel"]),
                                  np.asarray(params["a"]["kernel"]))


def test_checkpoint_manager_roundtrip(tmp_path):
    from dynamicrafter_tpu.training.trainer import TrainState

    state = TrainState(step=jnp.asarray(7), params={"w": jnp.ones((3,))},
                       opt_state=(), ema_params={"w": jnp.zeros((3,))})
    mngr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    assert mngr.save(7, state)
    mngr.wait()
    restored = mngr.restore(state)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.ema_params["w"]),
                                  np.zeros(3))
    assert mngr.latest_step() == 7
    mngr.close()


def test_monitored_top_k_checkpoints(tmp_path):
    """monitor-based best-k retention (reference main/utils_train.py:68-73:
    model.params.monitor -> ModelCheckpoint save_top_k=3 mode='min'): only
    the 3 checkpoints with the lowest monitored metric survive; a save
    without a measurement ranks worst and is dropped."""
    mngr = CheckpointManager(str(tmp_path / "ckpts"),
                             monitor="val/loss_ema", top_k=3, mode="min")
    for step, v in {1: 5.0, 2: 1.0, 3: 4.0, 4: 2.0, 5: 3.0}.items():
        assert mngr.save(step, {"w": np.arange(4.0) + step},
                         metrics={"val/loss_ema": v})
    mngr.wait()
    assert mngr.all_steps() == [2, 4, 5]    # best three by min val/loss_ema

    # checkpoint saved before any val pass: ranked worst, dropped
    mngr.save(6, {"w": np.zeros(4)})
    mngr.wait()
    assert 6 not in mngr.all_steps()

    restored = mngr.restore({"w": np.zeros(4)}, step=2)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(4.0) + 2)
    mngr.close()


def test_synthetic_dataset_and_loader():
    ds = SyntheticVideoDataset(video_length=4, resolution=(16, 16), size=10)
    sample = ds[0]
    assert sample["video"].shape == (4, 16, 16, 3)
    assert -1.0 <= sample["video"].min() and sample["video"].max() <= 1.0

    loader = DataLoader(ds, batch_size=3, tokenizer=HashTokenizer(),
                        num_workers=1, prefetch=2)
    it = iter(loader)
    batch = next(it)
    assert batch["video"].shape == (3, 4, 16, 16, 3)
    assert batch["tokens"].shape == (3, 77)
    assert batch["fs"].shape == (3,)
    it.close()


def test_loader_workers_decode_concurrently():
    """num_workers decode threads overlap (round-1 review: num_workers was
    accepted but dead — one producer thread did everything)."""
    import threading
    import time

    active = {"n": 0, "max": 0}
    lock = threading.Lock()

    class SlowDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with lock:
                active["n"] += 1
                active["max"] = max(active["max"], active["n"])
            time.sleep(0.05)
            with lock:
                active["n"] -= 1
            return {"video": np.zeros((2, 8, 8, 3), np.float32),
                    "caption": "x", "fps": np.float32(8),
                    "frame_stride": np.int32(1)}

    loader = DataLoader(SlowDataset(), batch_size=4, num_workers=4,
                        prefetch=4)
    it = iter(loader)
    for _ in range(6):
        next(it)
    it.close()
    assert active["max"] >= 3, f"max concurrency {active['max']} — decode not parallel"


def test_loader_multihost_shards_disjoint_and_deterministic():
    """Two 'hosts' see disjoint index slices of the same epoch shuffle, and
    worker count never changes the batch stream (per-worker seeding +
    index sharding, reference main/utils_data.py:15-28)."""
    ds = SyntheticVideoDataset(video_length=2, resolution=(8, 8), size=20)
    idx0 = DataLoader(ds, batch_size=2, seed=7, shard_id=0,
                      num_shards=2)._epoch_indices(0)
    idx1 = DataLoader(ds, batch_size=2, seed=7, shard_id=1,
                      num_shards=2)._epoch_indices(0)
    assert not set(idx0) & set(idx1), "host shards overlap"
    assert sorted(idx0 + idx1) == list(range(20))

    def first_batches(num_workers, n=4):
        loader = DataLoader(ds, batch_size=2, seed=3,
                            num_workers=num_workers, max_epochs=1)
        out = []
        it = iter(loader)
        for _ in range(n):
            out.append(next(it)["video"])
        it.close()
        return out

    for a, b in zip(first_batches(1), first_batches(4)):
        np.testing.assert_array_equal(a, b)


def test_loader_rejects_shard_smaller_than_batch():
    """A shard with fewer samples than batch_size used to make the loader
    spin forever yielding nothing (silent hang at next()); it must raise
    at construction instead."""
    import pytest

    ds = SyntheticVideoDataset(video_length=2, resolution=(8, 8), size=3)
    # shard 1 of 2 holds only index 1 -> 1 sample < batch_size 2
    with pytest.raises(ValueError, match="fewer than batch_size"):
        DataLoader(ds, batch_size=2, shard_id=1, num_shards=2)
    # boundary: shard size == batch_size is fine (shard 0 holds {0, 2})
    DataLoader(ds, batch_size=2, shard_id=0, num_shards=2)


def test_resize_center_crop():
    frames = np.zeros((2, 100, 60, 3), np.uint8)
    out = _resize_center_crop(frames, (32, 48))
    assert out.shape == (2, 32, 48, 3)


def test_webvid_dataset(tmp_path):
    import cv2

    # build two tiny mp4s + csv metadata
    vid_dir = tmp_path / "videos" / "p0"
    vid_dir.mkdir(parents=True)
    for vid in ("000", "001"):
        writer = cv2.VideoWriter(str(vid_dir / f"{vid}.mp4"),
                                 cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for i in range(30):
            frame = np.full((48, 64, 3), i * 8 % 255, np.uint8)
            writer.write(frame)
        writer.release()
    meta = tmp_path / "meta.csv"
    meta.write_text(
        "videoid,page_dir,name\n000,p0,a red fox\n001,p0,a blue bird\n"
        "broken,p0,missing file\n")

    ds = WebVidDataset(str(meta), str(tmp_path / "videos"), video_length=4,
                       frame_stride=3, resolution=(32, 32), seed=0)
    s = ds[0]
    assert s["video"].shape == (4, 32, 32, 3)
    assert s["caption"] == "a red fox"
    assert int(s["frame_stride"]) >= 1
    # index 2 is a missing file -> retry loop lands on a decodable one
    s2 = ds[2]
    assert s2["video"].shape == (4, 32, 32, 3)


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    """3 steps of scripts/train.py on the tiny config + synthetic data."""
    import yaml

    from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG

    cfg = dict(TINY_MODEL_CONFIG)
    cfg["data"] = {"params": {"batch_size": 2, "train": {"params": {
        "video_length": 4, "resolution": [16, 16]}}}}
    cfg["lightning"] = {"trainer": {"accumulate_grad_batches": 1,
                                    "max_steps": 3,
                                    "gradient_clip_val": 0.5},
                        "callbacks": {"model_checkpoint":
                                      {"params": {"every_n_train_steps": 2}}}}
    cfg_path = tmp_path / "tiny_train.yaml"
    cfg_path.write_text(yaml.dump(cfg))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # single-device subprocess: these are CLI smokes (flags, loader, ckpt,
    # logging). On the 8-virtual-device mesh the XLA:CPU compile of the
    # dp=8 ZeRO train step exceeds the timeout on small-core machines;
    # sharded training itself is covered by test_trainer.py and
    # __graft_entry__.dryrun_multichip.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train.py"),
         "--config", str(cfg_path), "--name", "smoke",
         "--logdir", str(tmp_path / "logs"), "--synthetic_data",
         "--max_steps", "3", "--log_every", "1"],
        capture_output=True, text=True, env=env, timeout=1200, cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    assert os.path.exists(tmp_path / "logs" / "smoke" / "metrics.csv")
    with open(tmp_path / "logs" / "smoke" / "metrics.csv") as f:
        header = f.readline().strip().split(",")
    # per-step device-memory telemetry (CUDACallback parity,
    # main/callbacks.py:104-133) must land as a CSV column
    assert "peak_hbm_gb" in header, header
    ckdir = tmp_path / "logs" / "smoke" / "checkpoints"
    assert any(os.scandir(ckdir)), "no checkpoint written"

    # weight-only resume (reference trainer.py:28): weights + EMA restored,
    # fresh optimizer and step counter — the run starts again from step 0.
    # Also exercises the reference --base/-b config spelling.
    res2 = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train.py"),
         "--base", str(cfg_path), "--name", "smoke",
         "--logdir", str(tmp_path / "logs"), "--synthetic_data",
         "--max_steps", "1", "--log_every", "1",
         "--auto_resume_weight_only"],
        capture_output=True, text=True, env=env, timeout=1200, cwd=repo)
    assert res2.returncode == 0, res2.stderr[-3000:]
    train_log = (tmp_path / "logs" / "smoke" / "train.log").read_text()
    assert "weight-only resume from step 3" in train_log
    # the step counter restarted: the resumed run logs step 1 again
    assert "step 1:" in train_log.split("weight-only resume")[-1]


def test_grain_loader_matches_schema_and_shards():
    """GrainDataLoader (process-worker pipeline option) yields the same
    batch schema as DataLoader and shards records disjointly across hosts
    (reference torch DataLoader num_workers processes equivalent)."""
    from dynamicrafter_tpu.data.grain_loader import GrainDataLoader, make_loader
    from dynamicrafter_tpu.utils.tokenizer import HashTokenizer

    ds = SyntheticVideoDataset(video_length=4, resolution=(16, 16), size=12)
    dl = GrainDataLoader(ds, batch_size=4, tokenizer=HashTokenizer(),
                         num_workers=0, max_epochs=1, seed=0)
    batches = list(dl)
    assert len(batches) == 3
    b = batches[0]
    assert b["video"].shape == (4, 4, 16, 16, 3)
    assert b["fs"].shape == (4,) and b["fs"].dtype == np.int32
    assert len(b["captions"]) == 4 and isinstance(b["captions"][0], str)
    assert b["tokens"].shape[0] == 4

    def records(shard):
        out = []
        for bb in GrainDataLoader(ds, batch_size=2, num_workers=0,
                                  max_epochs=1, seed=0, shuffle=False,
                                  shard_id=shard, num_shards=2):
            out.extend(np.asarray(bb["video"]).sum(axis=(1, 2, 3, 4)).tolist())
        return out

    r0, r1 = records(0), records(1)
    assert len(r0) == 6 and len(r1) == 6
    assert not set(r0) & set(r1)

    # factory returns the thread loader for 'threads'
    assert type(make_loader("threads", ds, batch_size=2)).__name__ == "DataLoader"


@pytest.mark.slow
def test_grain_loader_worker_processes():
    """worker_count>0 spawns real processes; dataset must be picklable.
    Grain shards the sampler stream across workers BEFORE batching, so
    batch composition depends on worker count — but the record SET must be
    identical (and the stream deterministic for a fixed count)."""
    from dynamicrafter_tpu.data.grain_loader import GrainDataLoader

    def record_sums(workers):
        out = []
        for b in GrainDataLoader(SyntheticVideoDataset(
                video_length=4, resolution=(16, 16), size=8),
                batch_size=2, num_workers=workers, max_epochs=1, seed=1):
            out.extend(np.asarray(b["video"]).sum(axis=(1, 2, 3, 4)).round(3)
                       .tolist())
        return out

    a, a2, c = record_sums(2), record_sums(2), record_sums(0)
    assert len(a) == 8
    assert a == a2                       # deterministic for fixed count
    assert sorted(a) == sorted(c)        # same records either way


@pytest.mark.slow
def test_train_cli_1024_recipe_smoke(tmp_path):
    """One train step through the REAL 576x1024 recipe YAML
    (configs/training_1024_v1.0.yaml: v-param, base_scale 0.3, perframe_ae,
    use_checkpoint/remat, dropout 0.1, fps conditioning, bs 1) with a tiny
    width/depth overlay stacked via the CLI's multi-config merge — the same
    code path as the on-chip 1024 training run (reference recipe:
    /root/reference/configs/training_1024_v1.0/config.yaml)."""
    import yaml

    from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG

    tiny = TINY_MODEL_CONFIG["model"]["params"]
    overlay = {
        "model": {"params": {
            "unet_config": {"params": {
                "model_channels": 32,
                "attention_resolutions": [2, 1],
                "num_res_blocks": 1,
                "channel_mult": [1, 2],
                "num_head_channels": 16,
                "context_dim": 48,
                "temporal_length": 4,
            }},
            "first_stage_config": tiny["first_stage_config"],
            "image_proj_stage_config": tiny["image_proj_stage_config"],
            "clip_text_config": tiny["clip_text_config"],
            "clip_vision_config": tiny["clip_vision_config"],
        }},
        "data": {"params": {"batch_size": 1, "train": {"params": {
            "video_length": 4, "resolution": [16, 16]}}}},
        "lightning": {"trainer": {"max_steps": 1}},
    }
    ov_path = tmp_path / "shrink_1024.yaml"
    ov_path.write_text(yaml.dump(overlay))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # single-device subprocess: these are CLI smokes (flags, loader, ckpt,
    # logging). On the 8-virtual-device mesh the XLA:CPU compile of the
    # dp=8 ZeRO train step exceeds the timeout on small-core machines;
    # sharded training itself is covered by test_trainer.py and
    # __graft_entry__.dryrun_multichip.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train.py"),
         "--config", os.path.join(repo, "configs", "training_1024_v1.0.yaml"),
         str(ov_path), "--name", "smoke1024",
         "--logdir", str(tmp_path / "logs"), "--synthetic_data",
         "--max_steps", "1", "--log_every", "1", "--bf16"],
        capture_output=True, text=True, env=env, timeout=1200, cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    csv = tmp_path / "logs" / "smoke1024" / "metrics.csv"
    assert csv.exists() and "loss" in csv.read_text()


@pytest.mark.slow
def test_train_cli_interp_preset_smoke(tmp_path):
    """One train step through the REAL interp/loop fine-tune preset
    (configs/training_512_interp.yaml — reference
    configs/training_512_v1.0/config_interp.yaml: interp_mode on,
    rand_cond_frame off) shrunk with a tiny overlay. Asserts the interp
    batch path is active from the YAML alone (train.log records the batch
    prep flags; the first/last-frame concat math itself is pinned by
    tests/test_trainer.py::test_interp_mode_batch_prep_first_last_concat)."""
    import yaml

    from dynamicrafter_tpu.config import ModelConfig
    from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # YAML-alone flag plumbing (scripts/train.py maps these into TrainConfig)
    mc = ModelConfig.from_yaml(
        os.path.join(repo, "configs", "training_512_interp.yaml"))
    assert mc.interp_mode is True
    assert mc.rand_cond_frame is False
    assert "interp" in mc.pretrained_checkpoint

    tiny = TINY_MODEL_CONFIG["model"]["params"]
    overlay = {
        "model": {"params": {
            "unet_config": {"params": {
                "model_channels": 32,
                "attention_resolutions": [2, 1],
                "num_res_blocks": 1,
                "channel_mult": [1, 2],
                "num_head_channels": 16,
                "context_dim": 48,
                "temporal_length": 4,
            }},
            "first_stage_config": tiny["first_stage_config"],
            "image_proj_stage_config": tiny["image_proj_stage_config"],
            "clip_text_config": tiny["clip_text_config"],
            "clip_vision_config": tiny["clip_vision_config"],
        }},
        "data": {"params": {"batch_size": 1, "train": {"params": {
            "video_length": 4, "resolution": [16, 16]}}}},
        "lightning": {"trainer": {"max_steps": 1}},
    }
    ov_path = tmp_path / "shrink_interp.yaml"
    ov_path.write_text(yaml.dump(overlay))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train.py"),
         "--base", os.path.join(repo, "configs", "training_512_interp.yaml"),
         str(ov_path), "--name", "smokeinterp",
         "--logdir", str(tmp_path / "logs"), "--synthetic_data",
         "--max_steps", "1", "--log_every", "1"],
        capture_output=True, text=True, env=env, timeout=1200, cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    train_log = (tmp_path / "logs" / "smokeinterp" / "train.log").read_text()
    assert "interp_mode=True" in train_log
    assert "rand_cond_frame=False" in train_log
    csv = tmp_path / "logs" / "smokeinterp" / "metrics.csv"
    assert csv.exists() and "loss" in csv.read_text()


def test_iterable_dataset_worker_sharding_and_order():
    """IterableVideoDataset (reference lvdm/data/base.py:5-23) through the
    loader: workers own disjoint floor-split sample_ids slices (reference
    worker_init_fn, main/utils_data.py:21-25), items are drawn round-robin,
    and the batch stream is deterministic."""
    from dynamicrafter_tpu.data.webvid import IterableVideoDataset

    class RangeIterable(IterableVideoDataset):
        def __iter__(self):
            for i in self.sample_ids:
                yield {"video": np.full((2, 4, 4, 3), i, np.float32),
                       "caption": f"c{i}", "frame_stride": np.int32(1)}

    ds = RangeIterable(num_records=10)
    # reference split arithmetic: 10 // 3 = 3 per worker, remainder dropped
    assert ds.shard(0, 3).sample_ids == [0, 1, 2]
    assert ds.shard(2, 3).sample_ids == [6, 7, 8]
    assert ds.shard(0, 3).sample_ids != ds.sample_ids  # copy, not mutation

    def run():
        loader = DataLoader(ds, batch_size=2, num_workers=3, shuffle=False,
                            max_epochs=1)
        return [[int(b["video"][j, 0, 0, 0, 0]) for j in range(2)]
                for b in loader]

    batches = run()
    # round-robin across worker slices [0,1,2] [3,4,5] [6,7,8]
    assert batches == [[0, 3], [6, 1], [4, 7], [2, 5]]
    assert run() == batches  # deterministic

    # multi-host first (disjoint host slices), then workers split each
    l0 = DataLoader(ds, batch_size=2, num_workers=2, shuffle=False,
                    max_epochs=1, shard_id=0, num_shards=2)
    l1 = DataLoader(ds, batch_size=2, num_workers=2, shuffle=False,
                    max_epochs=1, shard_id=1, num_shards=2)
    seen0 = {int(b["video"][j, 0, 0, 0, 0]) for b in l0 for j in range(2)}
    seen1 = {int(b["video"][j, 0, 0, 0, 0]) for b in l1 for j in range(2)}
    assert seen0.isdisjoint(seen1)
    assert seen0 | seen1 <= set(range(10))
