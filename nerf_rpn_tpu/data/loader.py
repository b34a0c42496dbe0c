"""Background batch prefetching — the TPU-side analogue of the reference's
``DataLoader(num_workers=4, pin_memory=True)`` input pipelines
(``run_rpn.py:332-339``, ``run_fcos.py:307-312``, ``run_rpn_detect.py:289``).

Two levels of overlap, both off the consumer's critical path:

- **sample loading** fans out over a thread pool inside ``batch_iterator``
  (npz decompression, the augmentation resample — numpy and zlib release
  the GIL, and the rotate+scale path is native C++);
- **batch assembly + host->device transfer**: ``prefetch_iterator`` runs the
  whole batch generator (and an optional ``transform``, e.g. a sharded
  ``jax.device_put``) in ONE background thread with a bounded ready-queue.
  Through this image's tunneled TPU a transfer costs a ~26 ms round-trip;
  issuing it one batch ahead hides it behind the previous step's compute.

This module stays jax-free (the device transform is injected by the
driver): the host input path must never import jax
(``tests/test_second_stage.py::test_host_input_loops_are_jnp_free``).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_DONE = object()


def prefetch_iterator(
    iterable: Iterable,
    depth: int = 2,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Yield ``transform(item)`` for each item, prepared up to ``depth``
    items ahead in a daemon thread.

    - ``depth <= 0`` degrades to a synchronous in-line loop (kill switch).
    - Exceptions raised by the iterable or the transform re-raise at the
      consumer's next pull, after which iteration stops.
    - Dropping the returned generator (``close()`` / GC) signals the worker
      to stop; the worker never blocks forever on a full queue.
    """
    if depth <= 0:
        for item in iterable:
            yield transform(item) if transform is not None else item
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(payload) -> bool:
        while not stop.is_set():
            try:
                q.put(payload, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker():
        try:
            for item in iterable:
                if transform is not None:
                    item = transform(item)
                if not _put(("item", item)):
                    return
            _put(("done", None))
        except BaseException as e:  # re-raised on the consumer side
            _put(("error", e))

    thread = threading.Thread(
        target=_worker, name="nerf-rpn-prefetch", daemon=True)
    thread.start()
    try:
        while True:
            kind, payload = q.get()
            if kind == "item":
                yield payload
            elif kind == "done":
                return
            else:
                raise payload
    finally:
        stop.set()
