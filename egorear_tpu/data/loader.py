"""Host-side batched loader with threaded decode and device prefetch.

Replaces the reference's torch DataLoader worker processes
(pl_wrappers/egoposeformer/heatmap.py:178-213) with a thread pool (PIL decode
releases the GIL) feeding a double-buffered ``jax.device_put`` queue, so
host decode overlaps device compute. Batches are dict-of-ndarray; non-array
fields (e.g. ``frame_path``) are collected into lists and not transferred.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import threading
from typing import Iterator, Optional

import jax
import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        seed: int = 0,
        sharding=None,
        prefetch: int = 2,
        device_put: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.sharding = sharding
        self.prefetch = prefetch
        self.device_put = device_put
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            yield order[i : i + self.batch_size]

    def _collate(self, samples):
        batch = {}
        for k in samples[0]:
            vals = [s[k] for s in samples]
            if isinstance(vals[0], np.ndarray):
                batch[k] = np.stack(vals)
            else:
                batch[k] = vals
        return batch

    def _host_batches(self) -> Iterator[dict]:
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            pending = collections.deque()
            it = self._batch_indices()

            def submit(idxs):
                futures = [pool.submit(self.dataset.__getitem__, int(i)) for i in idxs]
                pending.append(futures)

            # Keep a couple of batches in flight.
            for idxs in it:
                submit(idxs)
                if len(pending) > self.prefetch:
                    yield self._collate([f.result() for f in pending.popleft()])
            while pending:
                yield self._collate([f.result() for f in pending.popleft()])

    def __iter__(self) -> Iterator[dict]:
        queue: collections.deque = collections.deque()
        for host_batch in self._host_batches():
            dev_batch = self._transfer(host_batch)
            queue.append(dev_batch)
            if len(queue) > 1:
                yield queue.popleft()
        while queue:
            yield queue.popleft()

    def _transfer(self, batch: dict) -> dict:
        if not self.device_put:
            return batch
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                if self.sharding is not None:
                    out[k] = jax.device_put(v, self.sharding)
                else:
                    out[k] = jax.device_put(v)
            else:
                out[k] = v
        return out
