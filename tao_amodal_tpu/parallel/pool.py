"""Host-side worker pools for embarrassingly-parallel per-video work.

Capability-parity with the reference's pools
(``visualization/tao/utils/parallel/pool_context.py:22-50`` and
``fixed_gpu_pool.py:5-45``): a process pool whose workers hold an
initialized context (e.g. a loaded annotation index), and a
device-pinned pool where each worker owns one accelerator.  On TPU the
device pool is rarely the right tool (batch the videos instead — the
batch axis IS the pool), but visualization/IO fan-out still wants host
processes.
"""

from __future__ import annotations

import multiprocessing as mp

_worker_context = None


def _init_worker(context):
    global _worker_context
    _worker_context = context


def _call_with_context(args):
    func, item = args
    return func(_worker_context, item)


class PoolWithContext:
    """Process pool whose workers share an init-time context object."""

    def __init__(self, workers, context):
        self._pool = mp.Pool(workers, initializer=_init_worker,
                             initargs=(context,))

    def imap_unordered(self, func, items, chunksize=1):
        return self._pool.imap_unordered(
            _call_with_context, [(func, it) for it in items], chunksize)

    def map(self, func, items):
        return self._pool.map(_call_with_context,
                              [(func, it) for it in items])

    def close(self):
        self._pool.close()
        self._pool.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _device_worker(device_id, context, task_queue, out_queue, func):
    import os

    os.environ["TAO_AMODAL_DEVICE"] = str(device_id)
    _init_worker(context)
    while True:
        item = task_queue.get()
        if item is None:
            break
        out_queue.put(func(_worker_context, device_id, item))


class FixedDevicePool:
    """One worker process pinned per device id (reference
    ``FixedGpuPool`` capability; each worker sets
    ``TAO_AMODAL_DEVICE`` before importing device frameworks)."""

    def __init__(self, device_ids, context, func):
        self._tasks = mp.Queue()
        self._out = mp.Queue()
        self._procs = [
            mp.Process(target=_device_worker,
                       args=(d, context, self._tasks, self._out, func))
            for d in device_ids
        ]
        for p in self._procs:
            p.start()

    def run(self, items):
        for it in items:
            self._tasks.put(it)
        results = [self._out.get() for _ in items]
        for _ in self._procs:
            self._tasks.put(None)
        for p in self._procs:
            p.join()
        return results
