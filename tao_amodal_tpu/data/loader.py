"""Host data pipeline: async prefetch feeding device-batched clips.

The reference's loaders are torch ``DataLoader``s with worker
processes (``pysot/tools/train.py:57-71``, ``ltr/data/loader.py:120``);
the TPU-native shape is different: host threads decode+collate numpy
batches ahead of time, and the next batch is transferred to device
(sharded over the mesh's data axis) while the current step computes —
the standard double-buffered feed.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class PrefetchLoader:
    """Threaded prefetch around a sample iterator + collate fn."""

    def __init__(self, sample_iter, collate_fn, batch_size,
                 num_workers=2, prefetch=2):
        self._iter = sample_iter
        self.collate = collate_fn
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.num_workers = max(num_workers, 1)
        self._q = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in self._threads:
            t.start()

    def _next_samples(self):
        with self._lock:
            return [next(self._iter) for _ in range(self.batch_size)]

    def _worker(self):
        while not self._stop.is_set():
            try:
                samples = self._next_samples()
            except StopIteration:
                self._q.put(None)
                return
            batch = self.collate(samples)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()


def device_feed(loader, mesh=None):
    """Wrap a host loader with device placement (sharded over 'data'
    when a mesh is given) and one-batch lookahead."""
    import jax

    if mesh is not None:
        from tao_amodal_tpu.parallel.mesh import shard_batch

        def place(b):
            return shard_batch(mesh, b)
    else:
        def place(b):
            return jax.tree_util.tree_map(jax.device_put, b)

    it = iter(loader)
    try:
        pending = place(next(it))
    except StopIteration:
        return
    for batch in it:
        nxt = place(batch)  # transfer overlaps with consumer compute
        yield pending
        pending = nxt
    yield pending


def stack_collate(samples):
    """Default collate: stack same-keyed numpy arrays."""
    out = {}
    for key in samples[0]:
        out[key] = np.stack([np.asarray(s[key]) for s in samples])
    return out
