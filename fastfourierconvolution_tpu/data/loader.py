"""Batch loading: shuffling, normalisation to [-1, 1], device prefetch.

The torch-DataLoader role (reference util/data_loader.py DataLoader calls:
shuffle, drop_last, pin_memory, workers=8) re-designed for JAX/TPU:

  * epoch permutation with a seeded numpy RNG;
  * whole batches gathered as one ndarray, normalised
    ``x/127.5 - 1`` (the reference's Normalize(0.5, 0.5) on [0,1]);
  * a background thread keeps ``prefetch`` batches in flight so host
    decode overlaps device compute (the pin_memory/workers equivalent);
  * infinite iteration (the reference's re-iter on StopIteration,
    fgan_complete.py:359-363).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np


def normalize_to_unit(x: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1]."""
    return x.astype(np.float32) / 127.5 - 1.0


class DataLoader:
    """Minimal epoch-shuffled batch loader over a __len__/__getitem__
    dataset, yielding (images f32 [-1,1] NHWC, labels i64)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
        raw_uint8: bool = False,
        decode_threads: Optional[int] = None,
    ):
        """``batch_size`` is the GLOBAL batch. With ``process_count > 1``
        (multi-host pods) every host draws the same seeded epoch
        permutation and yields only its ``batch_size / process_count``
        slice of each global batch — the per-host input pipeline the
        reference never needed (single-process nn.DataParallel,
        SURVEY §2.8).

        ``decode_threads``: per-item datasets (file/tar readers that
        decode lazily) are gathered through a thread pool — PIL's
        JPEG decode releases the GIL, so this is the reference's
        DataLoader(num_workers=8) equivalent (util/data_loader.py).
        Default (None): 8 threads when the dataset has no contiguous
        in-memory store, 0 (serial) otherwise."""
        assert batch_size % max(process_count, 1) == 0, (
            "global batch must divide evenly across hosts"
        )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = max(process_count, 1)
        self.raw_uint8 = raw_uint8
        self.local_batch = batch_size // self.process_count
        in_memory = hasattr(dataset, "images") and hasattr(dataset, "labels")
        if decode_threads is None:
            decode_threads = 0 if in_memory else 8
        self.decode_threads = decode_threads
        self._pool = None  # created lazily (keeps pickling/fork simple)
        self._start_batch = 0

    def _items(self, idx: np.ndarray):
        """Gather dataset items, decoding through the thread pool when
        enabled."""
        ds = self.dataset
        if self.decode_threads > 0:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(
                    max_workers=self.decode_threads,
                    thread_name_prefix="ffc-decode",
                )
            return list(self._pool.map(lambda i: ds[int(i)], idx))
        return [ds[int(i)] for i in idx]

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        return order

    def _gather(self, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        # raw mode: ship uint8 and let the device normalise — 4x less
        # host->device traffic (the normalisation x/127.5-1 is the same
        # IEEE f32 op either side)
        ds = self.dataset
        if self.raw_uint8 and hasattr(ds, "images") and hasattr(ds, "labels"):
            return (
                np.ascontiguousarray(ds.images[idx]),
                np.asarray(ds.labels)[idx],
            )
        if self.raw_uint8:
            imgs, labels = zip(*self._items(idx))
            return np.stack(imgs), np.asarray(labels, np.int64)
        # Fast path: contiguous uint8 array stores go through the native
        # multithreaded gather+normalise engine (native/ffc_batcher.cpp).
        if hasattr(ds, "images") and hasattr(ds, "labels"):
            from . import native

            out = native.gather_normalize(ds.images, idx)
            if out is not None:
                return out, np.asarray(ds.labels)[idx]
        imgs, labels = zip(*self._items(idx))
        return normalize_to_unit(np.stack(imgs)), np.asarray(labels, np.int64)

    def skip_batches(self, n: int) -> None:
        """Fast-forward the epoch-permutation stream by ``n`` global
        batches WITHOUT gathering any data — the resume path: a
        restored run replays the seeded shuffles (cheap rng work only)
        so the post-resume data order matches an uninterrupted run
        exactly. Call before iteration starts. The reference restarts
        its DataLoader from scratch on resume (fgan_complete.py:359-363
        re-iter), losing data-order continuity; this is strictly
        stronger and what makes resume trajectory-exact
        (tests/test_multihost.py)."""
        assert n >= 0
        self._start_batch = int(n)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._epoch_order()
        n_full = len(order) // self.batch_size
        has_partial = (
            not self.drop_last
            and self.process_count == 1
            and n_full * self.batch_size < len(order)
        )
        # resume fast-forward: whole skipped epochs advance the seeded
        # rng by one shuffle each; the remainder offsets into this
        # epoch's order
        skip = 0
        if self._start_batch:
            per_epoch = n_full + (1 if has_partial else 0)
            skip = self._start_batch
            self._start_batch = 0
            while skip >= per_epoch:
                skip -= per_epoch
                order = self._epoch_order()
            n_full_new = len(order) // self.batch_size
            assert n_full_new == n_full  # dataset size is fixed
        ends = n_full * self.batch_size
        lo = self.process_index * self.local_batch
        hi = lo + self.local_batch
        for i in range(skip * self.batch_size, ends, self.batch_size):
            yield self._gather(order[i + lo : i + hi])
        if not self.drop_last and ends < len(order):
            if self.process_count > 1:
                # a partial global batch cannot be split evenly across
                # hosts (some would get empty/short slices and desync
                # the pod) — drop it, like drop_last
                return
            yield self._gather(order[ends:])

    def epochs(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Infinite batch stream with background prefetch.

        The producer uses a timed ``put`` so that when the consumer goes
        away (``stop`` set from the ``finally``) it can never stay
        blocked on a full queue — the round-1 thread-leak fix.
        """
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        # bind locally: at interpreter shutdown the module global
        # ``queue`` may already be cleared when the producer still spins
        full_exc = queue.Full

        def produce():
            while not stop.is_set():
                for batch in self:
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.2)
                            break
                        except full_exc:
                            continue
                    if stop.is_set():
                        return

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
            # drain so the producer's in-flight put can complete, then
            # join. The broad except covers interpreter-shutdown
            # finalization, where queue/thread internals misbehave —
            # but an operator interrupt (KeyboardInterrupt/SystemExit)
            # raised mid-drain must still propagate once the stop event
            # is set (ADVICE r2).
            try:
                while True:
                    q.get_nowait()
            except (KeyboardInterrupt, SystemExit):
                raise
            except BaseException:  # noqa: BLE001 - shutdown-time safety
                pass
            try:
                t.join(timeout=2.0)
            except (KeyboardInterrupt, SystemExit):
                raise
            except BaseException:  # noqa: BLE001 - shutdown-time safety
                pass
