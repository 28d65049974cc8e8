"""Asynchronous input pipeline (the reference's DataLoader-workers tier,
SURVEY.md 3.2: "DataLoader(workers=k) — process boundary: worker fork",
rebuilt host-side for the single-controller JAX model).

Three composable pieces, all order- and content-preserving:

  * ``prefetch(it, size)`` — run the iterator in one background producer
    thread with a bounded queue, so host batch construction (file reads,
    augmentation, padding) overlaps the device step dispatched by the
    consumer. Yields EXACTLY the producer's sequence; exceptions re-raise
    at the consumption point; closing the generator stops the producer.
  * ``device_prefetch(batches, size)`` — prefetch + ``jax.device_put``
    inside the producer thread: the host→device copy of batch k+1 rides
    under the device compute of batch k (the copy is the dominant serving
    cost through this environment's tunnel — CLAUDE.md).
  * parallel per-sample builds live in ``train.data.dataset_batches(
    num_workers=...)`` — thread-pool ``sample_to_arrays`` + augmentation
    with per-sample spawned RNGs, so any worker count produces the
    identical batch stream (resume replay stays a pure function of the
    seed, tests/test_prefetch.py pins it).

Threads, not processes: the hot per-sample work is NumPy/file-IO which
releases the GIL, and the fused C++ loader (native/pointcloud.cc via
ctypes) releases it for the whole read+crop+transform pass — the
reference needed worker *forks* only because its Python binning loop
held the GIL.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, TypeVar

import jax

T = TypeVar("T")

_END = object()


def prefetch(iterable: Iterable[T], size: int = 2) -> Iterator[T]:
    """Yield `iterable` unchanged, produced ahead by a background thread.

    `size` bounds how many ready items may be queued (memory cap). The
    producer stops promptly when the consumer closes the generator (or is
    garbage-collected); a producer-side exception is re-raised to the
    consumer at the point the failed item would have appeared.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, int(size)))
    stop = threading.Event()
    failure: list = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce() -> None:
        try:
            for item in iterable:
                if not _put(item):
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            failure.append(e)
        finally:
            _put(_END)

    t = threading.Thread(target=_produce, daemon=True,
                         name="tpu-pillars-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if failure:
                    raise failure[0]
                return
            yield item
    finally:
        stop.set()


def device_prefetch(batches: Iterable[T], size: int = 2,
                    device=None) -> Iterator[T]:
    """`prefetch`, with each batch `jax.device_put` in the producer thread.

    The consumer receives committed device arrays, so its step call pays no
    host→device transfer on the critical path — the copy of the NEXT batch
    overlaps the CURRENT step's compute. `device` defaults to JAX's default
    device; pass a `Sharding` to stage data-parallel batches.
    """

    def _staged() -> Iterator[T]:
        for b in batches:
            yield jax.tree.map(lambda x: jax.device_put(x, device), b)

    return prefetch(_staged(), size=size)
