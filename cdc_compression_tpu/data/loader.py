"""Threaded, host-sharded batch loader.

Replaces the reference's torch DataLoader + transposed collate
(`data/load_data.py`, `data/transposed_collate.py`) with a dependency-free
prefetching loader that yields NHWC float32 batches in [0,1].

Multi-host: pass (host_id, num_hosts) and each host reads a disjoint
stride of the dataset — the JAX-idiomatic per-host input sharding the
reference's unused `DistributedSampler` path was meant for
(`load_data.py:23-35`).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 4,
        host_id: int = 0,
        num_hosts: int = 1,
        prefetch: int = 4,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch

    def _indices(self, epoch: int) -> np.ndarray:
        n = len(self.ds)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(idx)
        idx = idx[self.host_id :: self.num_hosts]
        if self.shuffle and 0 < len(idx) < self.batch_size:
            # tiny datasets (e.g. the 3-image Kodak subset on this box):
            # sample with repetition up to one full batch — per-item crop
            # rngs still differ, so the repeated entries are distinct crops
            idx = np.resize(idx, self.batch_size)
        return idx

    def __iter__(self) -> Iterator[np.ndarray]:
        epoch = 0
        while True:
            idx = self._indices(epoch)
            nb = len(idx) // self.batch_size
            if not self.drop_last and len(idx) % self.batch_size:
                nb += 1
            if nb == 0:
                raise RuntimeError("dataset smaller than one batch")
            yield from self._run_epoch(idx, nb, epoch)
            epoch += 1

    def _run_epoch(self, idx, nb, epoch):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                    rng = np.random.RandomState((self.seed, epoch, b, self.host_id).__hash__() & 0x7FFFFFFF)
                    imgs = [self.ds.__getitem__(int(i), rng=rng) for i in sel]
                    q.put(np.stack(imgs, 0))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def cycle(loader: Loader) -> Iterator[np.ndarray]:
    return iter(loader)
