"""Background-prefetching batch loader (no torch dependency).

The reference uses torch DataLoader with 8 worker processes
(stereo_datasets.py:537-538); here a thread pool decodes/augments samples
(cv2/PIL release the GIL for the heavy work) and a bounded queue overlaps
host data work with device steps.  Static shapes by construction (fixed
crop / fixed sample_q), so every batch hits the same compiled program.
"""

from __future__ import annotations

import queue
from queue import Empty as _QueueEmpty  # bound early: at interpreter
# shutdown the module global `queue` may already be None when a consumer
# generator is finalized, making `except queue.Empty` a TypeError
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate_batch(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], axis=0) for k in keys}


def device_prefetch(iterator: Iterator[Dict[str, np.ndarray]], size: int = 2):
    """Wrap a host-batch iterator so device_put of batch N+1 overlaps the
    step running on batch N (async dispatch): yields device-resident
    batches.  The torch analog is DataLoader(pin_memory=True) + H2D
    overlap, which the reference relies on implicitly."""
    import collections

    import jax

    buf = collections.deque()
    for batch in iterator:
        buf.append(jax.device_put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class CheckpointablePrefetch:
    """One-batch device prefetch over a checkpointable (get_state/set_state)
    iterator: device_put of batch N+1 overlaps the step running on batch N
    — without breaking the trainer's exactly-once checkpoint contract,
    because the serialized iterator state is snapshotted around every
    fetch and exposed paired with the batch actually handed out.

    After next() returns batch N:
      * state_of_current    — state whose next fetch is batch N (the
        emergency-checkpoint sidecar: the failed step's batch replays);
      * state_after_current — state whose next fetch is batch N+1 (the
        normal post-step checkpoint sidecar).
    """

    def __init__(self, it, place=None):
        import jax

        self._it = it
        self._place = jax.device_put if place is None else place
        self._buf_state = it.get_state()  # points at the buffered batch
        self._buf = self._place(next(it))
        self._next_state = it.get_state()  # points at the batch after it
        self.state_of_current = None
        self.state_after_current = None

    def __iter__(self):
        return self

    def __next__(self):
        batch = self._buf
        self.state_of_current = self._buf_state
        self.state_after_current = self._next_state
        self._buf_state = self._next_state
        self._buf = self._place(next(self._it))
        self._next_state = self._it.get_state()
        return batch


class PrefetchLoader:
    """Iterate shuffled batches forever (drop_last semantics).

    Each epoch reshuffles with a per-epoch seed derived from `seed`; each
    sample gets its own RandomState so augmentation is reproducible and
    thread-order independent (the per-worker reseed of
    stereo_datasets.py:90-96 made deterministic).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 8,
        seed: int = 0,
        prefetch: int = 4,
        shuffle: bool = True,
        host_index: Optional[int] = None,
        host_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.prefetch = prefetch
        self.shuffle = shuffle
        # multi-host data sharding: every host shuffles with the same seed
        # (so the global permutation agrees) then takes its strided slice —
        # batch_size is the PER-HOST batch.  Defaults to the jax process
        # topology; single-host behavior is unchanged.
        if host_index is None or host_count is None:
            try:
                import jax

                host_index = jax.process_index() if host_index is None else host_index
                host_count = jax.process_count() if host_count is None else host_count
            except Exception:
                host_index, host_count = 0, 1
        if not 0 <= host_index < host_count:
            raise ValueError(f"host_index {host_index} not in [0, {host_count})")
        self.host_index = host_index
        self.host_count = host_count

    def __len__(self) -> int:
        return len(self.dataset) // self.host_count // self.batch_size

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(idx)
        idx = idx[self.host_index :: self.host_count]
        # truncate to the COMMON per-host length: with len(dataset) not
        # divisible by host_count, earlier hosts would otherwise see one
        # more sample per epoch, de-phasing the hosts' epoch counters and
        # breaking the disjoint-slices-of-one-shuffle guarantee over time
        idx = idx[: len(self.dataset) // self.host_count]
        n = (len(idx) // self.batch_size) * self.batch_size
        return idx[:n]

    def _sample(self, index: int, sample_seed: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(sample_seed)
        return self.dataset.__getitem__(int(index), rng=rng)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            epoch = 0
            with ThreadPoolExecutor(self.num_workers) as pool:
                while not stop.is_set():
                    idx = self._epoch_indices(epoch)
                    for b0 in range(0, len(idx), self.batch_size):
                        if stop.is_set():
                            return
                        chunk = idx[b0 : b0 + self.batch_size]
                        seeds = [
                            self.seed * 1_000_003 + epoch * 10_007 + int(i)
                            for i in chunk
                        ]
                        try:
                            samples = list(
                                pool.map(self._sample, chunk, seeds)
                            )
                        except RuntimeError:
                            # interpreter teardown shuts the executor down
                            # under us ("cannot schedule new futures after
                            # shutdown") — exit quietly, nothing to produce
                            return
                        out_q.put(collate_batch(samples))
                    epoch += 1

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                yield out_q.get()
        finally:
            stop.set()
            # drain so the producer can exit a blocking put
            try:
                while True:
                    out_q.get_nowait()
            except Exception:
                # includes _QueueEmpty, and the TypeError the stdlib queue
                # itself raises at interpreter teardown when its module
                # globals (queue.Empty) have been cleared to None
                pass
