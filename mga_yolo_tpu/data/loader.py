"""Threaded prefetching data loader with deterministic per-epoch shuffling.

Replaces the reference's torch ``InfiniteDataLoader`` + worker processes +
``DistributedSampler`` (`data/build.py:30,177`) with a thread-pool pipeline
(cv2/numpy release the GIL for the heavy ops) and **per-host sharding**: in a
multi-host TPU setup each process loads only its ``1/num_hosts`` slice of
every global batch (SURVEY.md §5.8), which is the jax-native replacement for
DistributedSampler.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from mga_yolo_tpu.data.dataset import MGADataset, collate


class DataLoader:
    """Deterministic, sharded, prefetching loader over an MGADataset."""

    def __init__(
        self,
        dataset: MGADataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        workers: int = 8,
        drop_last: bool = True,
        prefetch: int = 4,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        assert batch_size % num_shards == 0, "global batch must divide across hosts"
        self.dataset = dataset
        self.global_batch = batch_size
        self.local_batch = batch_size // num_shards
        self.shuffle = shuffle
        self.seed = seed
        self.workers = max(1, workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0
        self.size_buckets: list[int] | None = None  # bucketed multi-scale sizes
        # raw mode: emit un-warped canvases + matrices for device-side
        # augmentation (data/device_augment.py) instead of finished samples
        self.raw_mode = False

    def __len__(self) -> int:
        if getattr(self.dataset, "rect", False):
            return len(self._epoch_batches())
        n = len(self.dataset)
        return n // self.global_batch if self.drop_last else -(-n // self.global_batch)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _epoch_order(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        if self.drop_last and n >= self.global_batch:
            order = order[: (n // self.global_batch) * self.global_batch]
        elif not self.drop_last and self.num_shards > 1 and n % self.global_batch:
            # multi-host eval: pad the tail to a full global batch (wrap-around
            # indices) so every host's local shard has the same static shape;
            # consumers deduplicate via the batch's `index` array
            pad = self.global_batch - (n % self.global_batch)
            order = np.concatenate([order, order[:pad]])
        return order

    def _epoch_batches(self) -> list[np.ndarray]:
        """Global-batch index arrays. For rect datasets batches are formed
        WITHIN an aspect bucket (reference set_rectangle sorts by ar) and
        every batch is wrap-padded to full size — a partial batch would be a
        new static shape and a fresh XLA compile; consumers drop the padded
        rows via the batch's `index` array."""
        if not getattr(self.dataset, "rect", False):
            order = self._epoch_order()
            B = self.global_batch
            nb = len(order) // B if self.drop_last else -(-len(order) // B)
            return [order[i * B : (i + 1) * B] for i in range(nb)]
        batches = []
        B = self.global_batch
        for b in range(len(self.dataset.bucket_shapes)):
            idx = np.nonzero(self.dataset.bucket == b)[0]
            if self.shuffle and len(idx):
                np.random.default_rng(self.seed + self.epoch + b).shuffle(idx)
            for i in range(0, len(idx), B):
                chunk = idx[i : i + B]
                if len(chunk) < B:  # wrap-pad within the bucket (same shape);
                    # np.resize tiles the chunk to exactly B rows, so even a
                    # 1-image bucket yields a full batch (one compile per
                    # bucket shape, and per-host shards stay even in
                    # multi-host val)
                    chunk = np.resize(chunk, B)
                batches.append(chunk)
        return batches

    def __iter__(self) -> Iterator[dict]:
        batch_list = self._epoch_batches()
        nb = len(batch_list)
        use_mosaic = getattr(self, "use_mosaic", True)

        def make_batch(bi: int) -> dict:
            global_idx = batch_list[bi]
            # per-host shard of the global batch
            local_idx = global_idx[self.shard_index :: self.num_shards]
            imgsz = None
            if self.size_buckets:
                # deterministic per-batch bucket, identical across hosts
                brng = np.random.default_rng(self.seed * 7919 + self.epoch * 104_729 + bi)
                imgsz = int(brng.choice(self.size_buckets))
            samples = []
            if self.raw_mode:
                from mga_yolo_tpu.data import device_augment as DA

                for di in local_idx:
                    rng = np.random.default_rng(
                        (self.seed * 1_000_003 + self.epoch * 10_007 + int(di)) % (2**63)
                    )
                    samples.append(
                        DA.build_raw_sample(self.dataset, int(di), rng, use_mosaic, imgsz)
                    )
                return DA.collate_raw(samples)
            for j, di in enumerate(local_idx):
                rng = np.random.default_rng(
                    (self.seed * 1_000_003 + self.epoch * 10_007 + int(di)) % (2**63)
                )
                samples.append(
                    self.dataset.get(int(di), rng, use_mosaic=use_mosaic, imgsz=imgsz)
                )
            return collate(samples)

        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            futures = queue.Queue()
            n_submit = min(self.prefetch, nb)
            for bi in range(n_submit):
                futures.put(pool.submit(make_batch, bi))
            next_bi = n_submit
            for _ in range(nb):
                fut = futures.get()
                if next_bi < nb:
                    futures.put(pool.submit(make_batch, next_bi))
                    next_bi += 1
                yield fut.result()
