"""Background-prefetching batch loader.

The reference overlaps input work with compute via 8 torch DataLoader worker
processes (reference: pipeline.py:507-513).  Here a single background thread
assembles PairBatches ahead of the device (PIL/numpy release the GIL, and
the sandbox has one host core anyway — the win is overlap with DEVICE time,
not host parallelism), and a small prefetch queue keeps the accelerator fed;
per-process sharding supports multi-host input pipelines.

Multi-host invariants:
  * the per-epoch shuffle seed comes from a host-independent counter
    (base_seed + epoch), NOT from the dataset RNG — augmentation draws
    consume that RNG a data-dependent number of times per host, so seeding
    from it would desynchronize the shared order after the first epoch and
    the strided shards would stop being disjoint;
  * with ``drop_last`` every host yields exactly the same number of batches
    (the floor over the smallest shard) — an extra batch on one host would
    deadlock the cross-host gradient psum.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class PrefetchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1,
                 sort_by_class: bool = False, seed: int = None,
                 train: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        # train=True collates the training subset only (no depth/pose
        # arrays built or transferred — datasets.collate / train_fields)
        self.train = train
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.sort_by_class = sort_by_class
        if seed is None:
            # draw ONCE at construction (shuffle only — an eval loader must
            # not perturb the dataset RNG stream): all hosts construct the
            # loader before any data work, so their dataset RNGs agree here
            seed = (int(getattr(dataset, "rs", np.random).randint(2 ** 31))
                    if shuffle else 0)
        self.base_seed = seed
        self._epoch = 0

    def _shard_len(self, rank: int) -> int:
        n = len(self.dataset)
        return (n - rank + self.process_count - 1) // self.process_count

    def __len__(self) -> int:
        if self.drop_last:
            # common count across hosts (see module docstring)
            return min(self._shard_len(r) for r in
                       range(self.process_count)) // self.batch_size
        return -(-self._shard_len(self.process_index) // self.batch_size)

    def _index_batches(self, rs: np.random.RandomState):
        order = np.arange(len(self.dataset))
        if self.sort_by_class:
            # group same-class pairs (fewer per-class metric programs per
            # batch at test time — see dataset.batches)
            keys = [str(inst[4]) for inst in self.dataset.instances]
            order = order[np.argsort(np.asarray(keys)[order], kind="stable")]
        if self.shuffle:
            rs.shuffle(order)
        order = order[self.process_index::self.process_count]
        limit = len(self) if self.drop_last else None
        emitted = 0
        for s in range(0, len(order), self.batch_size):
            if limit is not None and emitted >= limit:
                return
            idx = order[s: s + self.batch_size]
            n_real = len(idx)
            if n_real < self.batch_size:
                if self.drop_last:
                    return
                idx = np.concatenate([idx, np.full(self.batch_size - n_real,
                                                   idx[-1])])
            emitted += 1
            yield idx, n_real

    def __iter__(self) -> Iterator:
        rs = np.random.RandomState(
            (self.base_seed + self._epoch) % (2 ** 31) if self.shuffle else 0)
        self._epoch += 1
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batches = list(self._index_batches(rs))
        stop = threading.Event()

        def worker():
            try:
                for idx, n_real in batches:
                    if stop.is_set():
                        return
                    pairs = [self.dataset.get_pair(int(i), train=self.train)
                             for i in idx]
                    for p in pairs[n_real:]:
                        p["valid"] = 0.0   # final-batch pads (== batches())
                    out_q.put(self.dataset.collate(pairs, train=self.train))
            finally:
                out_q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                b = out_q.get()
                if b is None:
                    return
                yield b
        finally:
            # a worker parked in out_q.put() on the full queue never sees
            # stop; keep draining until the thread has actually exited —
            # a single drain can free one slot only for the worker's final
            # ``put(None)`` to refill it and park forever (leaked thread)
            stop.set()
            while t.is_alive():
                try:
                    while True:
                        out_q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.05)
