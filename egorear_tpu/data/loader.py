"""Host-side batched loader with threaded decode and device prefetch.

Replaces the reference's torch DataLoader worker processes
(pl_wrappers/egoposeformer/heatmap.py:178-213) with a thread pool (PIL decode
releases the GIL) feeding a double-buffered ``jax.device_put`` queue, so
host decode overlaps device compute. Batches are dict-of-ndarray; non-array
fields (e.g. ``frame_path``) are collected into lists and not transferred.

Multi-host (``jax.process_count() > 1``): every process walks the SAME global
batch-index sequence (seeded shuffle), loads only its contiguous
``batch_size / process_count`` slice of each batch, and the transfer step
assembles the global sharded array via
``jax.make_array_from_process_local_data``. This is the semantics of the
reference's DDP per-process batch/worker division
(pl_wrappers/egoposeformer/heatmap.py:159-176) without duplicated host IO.

``pad_last=True`` pads the final partial batch at the *index* level (repeat
the last index) so batch shapes stay static for jit, and reports the true
sample count in the ``__valid_n__`` batch key (a host int, not transferred).
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
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
        pad_last: bool = False,
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
        self.pad_last = pad_last
        self.epoch = 0

        # Multi-host: slice each global batch per process. Only sharded
        # (global-batch) loaders participate; a sharding-less loader is a
        # purely local object.
        self._pcount = jax.process_count() if sharding is not None else 1
        self._pindex = jax.process_index() if sharding is not None else 0
        if self._pcount > 1 and batch_size % self._pcount:
            raise ValueError(
                f"global batch size {batch_size} not divisible by "
                f"process count {self._pcount}"
            )

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        """Yields (global_index_array, true_n) pairs; identical sequence on
        every process (same seed/epoch)."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            idxs = order[i : i + self.batch_size]
            true_n = len(idxs)
            if self.pad_last and true_n < self.batch_size:
                idxs = np.concatenate(
                    [idxs, np.repeat(idxs[-1:], self.batch_size - true_n)]
                )
            yield idxs, true_n

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

            def submit(idxs, true_n):
                if self._pcount > 1:
                    per = self.batch_size // self._pcount
                    idxs = idxs[self._pindex * per : (self._pindex + 1) * per]
                futures = [
                    pool.submit(self.dataset.__getitem__, int(i)) for i in idxs
                ]
                pending.append((futures, true_n))

            def finish():
                futures, true_n = pending.popleft()
                batch = self._collate([f.result() for f in futures])
                if self.pad_last:
                    batch["__valid_n__"] = true_n
                return batch

            # Keep a couple of batches in flight.
            for idxs, true_n in self._batch_indices():
                submit(idxs, true_n)
                if len(pending) > self.prefetch:
                    yield finish()
            while pending:
                yield finish()

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
                if self._pcount > 1:
                    out[k] = jax.make_array_from_process_local_data(
                        self.sharding, v
                    )
                elif self.sharding is not None:
                    out[k] = jax.device_put(v, self.sharding)
                else:
                    out[k] = jax.device_put(v)
            else:
                out[k] = v
        return out
