"""Grain-based input pipeline (multi-PROCESS decode for multi-host TPU IO).

The thread-pool `DataLoader` in webvid.py parallelizes cv2 decode inside one
process; at multi-host scale the Python side (crop/resize/collate) can still
bottleneck one interpreter. This optional loader runs the same dataset
through Google Grain (`grain.python.DataLoader`) with true worker
PROCESSES, per-shard deterministic sampling, and the same batch dict as
webvid.DataLoader, so the trainer can switch with `--loader grain`.

Reference counterpart: main/utils_data.py:44-136 (Lightning
DataModuleFromConfig + torch DataLoader with num_workers processes).
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


class GrainDataLoader:
    """Same interface/batch schema as webvid.DataLoader, backed by Grain.

    dataset must be a random-access source (``__len__``/``__getitem__``
    returning the webvid sample dict) and picklable (worker processes).
    """

    def __init__(self, dataset, batch_size: int, tokenizer=None,
                 shuffle: bool = True, seed: int = 0, num_workers: int = 4,
                 prefetch: int = 4, fs_key: str = "frame_stride",
                 shard_id: int = 0, num_shards: int = 1,
                 max_epochs: Optional[int] = None):
        import grain.python as gp

        assert 0 <= shard_id < num_shards
        shard_len = len(range(shard_id, len(dataset), num_shards))
        if shard_len < batch_size:
            raise ValueError(
                f"shard {shard_id}/{num_shards} holds {shard_len} samples, "
                f"fewer than batch_size={batch_size}; with drop_remainder "
                f"the loader would never yield a batch.")
        self.dataset = dataset
        self.batch_size = batch_size
        self.tokenizer = tokenizer
        self.fs_key = fs_key
        sampler = gp.IndexSampler(
            num_records=len(dataset),
            shard_options=gp.ShardOptions(
                shard_index=shard_id, shard_count=num_shards,
                drop_remainder=True),
            shuffle=shuffle,
            num_epochs=max_epochs,
            seed=seed,
        )
        self._loader = gp.DataLoader(
            data_source=dataset,
            sampler=sampler,
            operations=[gp.Batch(batch_size, drop_remainder=True)],
            worker_count=num_workers,
            worker_buffer_size=max(1, prefetch),
        )

    def _finalize(self, rec: Dict) -> Dict[str, np.ndarray]:
        fs_dtype = np.float32 if self.fs_key == "fps" else np.int32
        captions = [str(c) for c in np.asarray(rec["caption"]).tolist()]
        batch = {
            "video": np.asarray(rec["video"]),
            "fs": np.asarray(rec[self.fs_key]).astype(fs_dtype),
            "captions": captions,
        }
        if self.tokenizer is not None:
            batch["tokens"] = self.tokenizer(captions)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for rec in self._loader:
            yield self._finalize(rec)


def make_loader(kind: str, *args, **kwargs):
    """Loader factory: kind in ('threads', 'grain')."""
    if kind == "grain":
        return GrainDataLoader(*args, **kwargs)
    from dynamicrafter_tpu.data.webvid import DataLoader

    return DataLoader(*args, **kwargs)
