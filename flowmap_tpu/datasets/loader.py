"""Host-side batched data loading with background prefetch (torch-free).

Replaces the reference's torch DataLoader + Lightning DataModule
(`flowmap/dataset/data_module_pretrain.py:34-84`): worker threads draw
examples from map-style or iterable datasets, collate fixed-shape clips into
(b, f, 3, h, w) NumPy batches, and a bounded queue keeps batches ready ahead
of the device. Seeding is per-loader (`seed + global_rank`), mirroring the
reference's rank-aware generators.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        seed: Optional[int] = 0,
        global_rank: int = 0,
        num_threads: int = 2,
        prefetch: int = 2,
        shuffle: bool = True,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(
            None if seed is None else seed + global_rank
        )
        self.shuffle = shuffle
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch

    def _example_iter(self) -> Iterator[dict]:
        iterable_only = hasattr(self.dataset, "__iter__") and not hasattr(
            self.dataset, "__getitem__"
        )
        if iterable_only or getattr(self.dataset, "is_iterable", False):
            while True:
                yield from iter(self.dataset)
        else:
            n = len(self.dataset)
            while True:
                order = (
                    self.rng.permutation(n) if self.shuffle else np.arange(n)
                )
                for i in order:
                    yield self.dataset[int(i)]

    @staticmethod
    def collate(examples: list[dict]) -> dict:
        batch: dict = {}
        for key in examples[0]:
            values = [e[key] for e in examples]
            if isinstance(values[0], np.ndarray):
                batch[key] = np.stack(values)
            elif isinstance(values[0], (int, float)):
                batch[key] = np.asarray(values)
            else:
                batch[key] = tuple(values)
        return batch

    def __iter__(self) -> Iterator[dict]:
        out_queue: queue.Queue = queue.Queue(maxsize=self.prefetch)
        source = self._example_iter()
        source_lock = threading.Lock()
        stop = threading.Event()

        def worker() -> None:
            while not stop.is_set():
                examples = []
                try:
                    with source_lock:
                        for _ in range(self.batch_size):
                            examples.append(next(source))
                except StopIteration:
                    out_queue.put(None)
                    return
                out_queue.put(self.collate(examples))

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_threads)
        ]
        for t in threads:
            t.start()
        try:
            while True:
                batch = out_queue.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
            # Drain so blocked workers can exit.
            while not out_queue.empty():
                out_queue.get_nowait()
