"""Host-sharded, thread-prefetched batch loader.

TPU-native replacement for the reference's torch DataLoader(num_workers=16)
(/root/reference/main_us3d.py:94-95): a seedable thread-pool pipeline that
decodes/augments samples ahead of the training step and collates to fixed
static shapes.  Multi-host: each process reads its own 1/Nth shard of the
sample list (``jax.process_index()``); batches are then device_put with a
batch-axis NamedSharding (see semstereo_tpu.parallel.shard_batch).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def collate(samples: list[dict]) -> dict:
    """Stack a list of sample dicts into a batch dict (numpy)."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], str):
            out[k] = vals
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        num_workers: int = 4,
        drop_last: bool = False,
        seed: int = 0,
        shard: tuple[int, int] = (0, 1),
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.seed = seed
        self.shard_index, self.shard_count = shard
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Reseed shuffling per epoch (deterministic across hosts)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            idx = np.random.default_rng(self.seed + self.epoch).permutation(idx)
        return idx[self.shard_index :: self.shard_count]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        nb = len(self)
        batches = [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]
        base = (self.seed + 1) * 1_000_003 + self.epoch * 97

        def load_one(i: int) -> dict:
            rng = np.random.default_rng(base + int(i))
            if hasattr(self.dataset, "get"):
                return self.dataset.get(int(i), rng)
            return self.dataset[int(i)]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(load_one, b))
                    q.put(collate(samples))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


class SyntheticStereoDataset:
    """Synthetic random stereo pairs with exact integer-shift disparities and
    piecewise-constant labels — for integration tests and benchmarks
    (SURVEY.md section 4 item 5)."""

    def __init__(self, size: int, height: int, width: int, maxdisp: int,
                 num_classes: int = 6, symmetric: bool = True, training: bool = True):
        self.size = size
        self.h, self.w = height, width
        self.maxdisp = maxdisp
        self.num_classes = num_classes
        self.symmetric = symmetric
        self.training = training

    def __len__(self):
        return self.size

    def get(self, index: int, rng: np.random.Generator) -> dict:
        rng = np.random.default_rng(index)  # deterministic per sample
        h, w = self.h, self.w
        right = rng.standard_normal((h, w, 3)).astype(np.float32)
        lo = -self.maxdisp // 2 if self.symmetric else 1
        hi = self.maxdisp // 2 if self.symmetric else self.maxdisp
        d = int(rng.integers(lo, hi))
        # left pixel x corresponds to right pixel x - d
        left = np.roll(right, d, axis=1)
        disparity = np.full((h, w), float(d), np.float32)
        label = (rng.integers(0, self.num_classes - 1, (1, 1)) * np.ones((h, w))).astype(
            np.float32
        )
        sample = {"left": left, "right": right, "disparity": disparity, "label": label}
        if self.training:
            sample["disparity_4"] = disparity[::4, ::4].copy()
        return sample
