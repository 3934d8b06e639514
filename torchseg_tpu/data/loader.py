"""Prefetching train loader — replaces torch DataLoader + DistributedSampler
(reference model/*/dataloader.py:36-64, num_workers=24).

A thread pool runs the cv2/numpy preprocess (cv2 releases the GIL) and a
bounded queue keeps batches ahead of the device step.  Batches are *global*:
the trainer's shard_map splits them across the mesh, which replaces the
reference's per-process DistributedSampler + batch_size // world_size.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def _collate(items):
    batch = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        else:
            batch[key] = vals
    return batch


class TrainLoader:
    """Iterate epochs of shuffled, drop-last global batches.

    Args:
      dataset: indexable with __len__, reshuffle(seed).
      batch_size: GLOBAL batch size (divisible by the mesh size).
      num_workers: preprocess threads.
      prefetch: max batches queued ahead.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        """DistributedSampler.set_epoch equivalent — reseeds the shuffle."""
        self._epoch = epoch

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed + self._epoch)
        if hasattr(self.dataset, "reshuffle"):
            self.dataset.reshuffle(self.seed + self._epoch)
        order = rng.permutation(len(self.dataset))
        nb = len(self)

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that honors early consumer exit (no thread leak
            # when the consumer breaks out of the epoch mid-way)
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                    items = list(pool.map(self.dataset.__getitem__, idxs))
                    if not _put(_collate(items)):
                        return
            _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def prefetch_to_device(iterator, mesh, axis: str = "data", size: int = 2,
                       place=None):
    """Wrap a host-batch iterator so the NEXT batch's H2D transfer overlaps
    the current step's compute (the device-side half of the input pipeline;
    the reference relies on torch DataLoader pinned-memory prefetch).

    Batches (dicts of numpy arrays) are placed sharded over the mesh's data
    axis — exactly what `parallel.shard_batch` does per step, but ahead of
    time.  jax transfers are async, so holding `size` device batches is
    enough to hide the copy.  ``place`` overrides the placement (e.g.
    ``parallel.spatial.place_batch`` for a 2-D dp x sp mesh).
    """
    import collections

    import numpy as np

    from ..parallel import shard_batch

    buf = collections.deque()

    def _place(batch):
        batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if place is not None:
            return place(batch)
        return shard_batch(batch, mesh, axis)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(_place(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(_place(next(it)))
        except StopIteration:
            pass
        yield out
