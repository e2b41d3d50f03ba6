"""Threaded host data loader: shuffle, parallel sample fetch, fixed-capacity
collate, device prefetch.

Replaces torch DataLoader(num_workers=N) + collate (reference
src/modules/data_loading.py:135-144, src/loader/dsec/loader.py:417-433).
h5py slicing releases the GIL inside HDF5, so a thread pool gets real IO
parallelism without process forking; batches come out as numpy dicts with
*static* shapes ready for `parallel.shard_batch`.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np

from .collate import collate_fixed_capacity


class DataLoader:
    """Minimal epoch-based loader over an indexable dataset."""

    def __init__(self, dataset, batch_size: int, capacity: int,
                 shuffle: bool = True, num_workers: int = 8,
                 polarity_aware: bool = False,
                 pos_capacity: Optional[int] = None,
                 drop_last: bool = True, seed: int = 0,
                 prefetch: int = 2,
                 collate_fn: Optional[Callable] = None,
                 capacity_buckets: Optional[Sequence[int]] = None,
                 shard: Optional[tuple] = None,
                 lut_cell_sort_params: Optional[tuple] = None):
        self.dataset = dataset
        # (rank, world): distributed sampler — all processes shuffle the SAME
        # order (shared seed) then stride-slice it, so host-local batches
        # assemble into a disjoint global batch (parallel/distributed.py;
        # the Lightning DistributedSampler analog).
        self.shard = shard
        self.batch_size = batch_size
        self.capacity = capacity
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.polarity_aware = polarity_aware
        self.pos_capacity = pos_capacity
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.collate_fn = collate_fn or (
            lambda samples: collate_fixed_capacity(
                samples, capacity, polarity_aware, pos_capacity,
                capacity_buckets=capacity_buckets,
                lut_cell_sort_params=lut_cell_sort_params))
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.shard is not None:
            rank, world = self.shard
            n = len(range(rank, n, world))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        if self.shard is not None:
            rank, world = self.shard
            order = order[rank::world]
        self._epoch += 1

        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, idxs))
                    out_q.put(self.collate_fn(samples))
            out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # Drain so the producer can exit.
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
