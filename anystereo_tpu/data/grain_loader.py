"""Grain-based input pipeline (optional alternative to PrefetchLoader).

Adds what the thread-pool loader cannot give: *checkpointable iteration*
(the iterator state serializes next to the model checkpoint, so a
preempted multi-host run resumes mid-epoch with no repeated or skipped
samples) and process-isolated workers.  Sharding, shuffling, and
per-sample augmentation RNG are all derived deterministically from
(seed, epoch, index) by grain's IndexSampler.

The reference's analog is torch DataLoader(worker_init_fn=seed_worker)
(stereo_datasets.py:529-538), which is neither deterministic across
restarts nor checkpointable.

Usage:
    loader = GrainLoader(dataset, batch_size=2, seed=0, num_workers=4)
    it = iter(loader)
    batch = next(it)           # dict of stacked numpy arrays
    state = it.get_state()     # bytes — save with the model checkpoint
    it.set_state(state)        # resume exactly here
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class _IndexSource:
    """Random-access source yielding bare indices; the heavy decode +
    augmentation runs in the RandomMap transform where grain provides a
    per-record deterministic RNG."""

    def __init__(self, n: int):
        self._n = n

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> int:
        return int(i)

    def __repr__(self) -> str:
        # grain validates checkpointed iterator state against
        # repr(data_source) — must be stable across loader instances
        return f"_IndexSource(n={self._n})"


class GrainLoader:
    """Deterministic, checkpointable batch loader over a StereoDataset.

    batch_size is PER-HOST (matching PrefetchLoader); host sharding
    defaults to the jax process topology.  Iterates forever
    (num_epochs=None) with a fresh shuffle each epoch, dropping the
    remainder so every batch has static shapes."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 0,
        seed: int = 0,
        shuffle: bool = True,
        host_index: Optional[int] = None,
        host_count: Optional[int] = None,
    ):
        import grain.python as pygrain

        if host_index is None or host_count is None:
            try:
                import jax

                host_index = (
                    jax.process_index() if host_index is None else host_index
                )
                host_count = (
                    jax.process_count() if host_count is None else host_count
                )
            except Exception:
                host_index, host_count = 0, 1
        if not 0 <= host_index < host_count:
            raise ValueError(
                f"host_index {host_index} not in [0, {host_count})"
            )
        self.host_index, self.host_count = host_index, host_count
        self.batch_size = batch_size
        self.dataset = dataset

        ds = dataset

        class _Augment(pygrain.RandomMapTransform):
            def random_map(self, i, rng: np.random.Generator):
                rs = np.random.RandomState(
                    np.asarray(rng.integers(0, 2**31), np.uint32)
                )
                return ds.__getitem__(int(i), rng=rs)

        sampler = pygrain.IndexSampler(
            num_records=len(dataset),
            shard_options=pygrain.ShardOptions(
                shard_index=host_index,
                shard_count=host_count,
                drop_remainder=True,
            ),
            shuffle=shuffle,
            num_epochs=None,  # iterate forever, reshuffling per epoch
            seed=seed,
        )
        self._loader = pygrain.DataLoader(
            data_source=_IndexSource(len(dataset)),
            sampler=sampler,
            operations=[
                _Augment(),
                pygrain.Batch(batch_size, drop_remainder=True),
            ],
            worker_count=num_workers,
        )

    def __len__(self) -> int:
        return len(self.dataset) // self.host_count // self.batch_size

    def __iter__(self):
        """Returns a PyGrainDatasetIterator — supports get_state() /
        set_state() for checkpointable resume."""
        return iter(self._loader)
