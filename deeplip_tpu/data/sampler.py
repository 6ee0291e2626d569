"""Speaker-balanced sampling and shape-bucketed crop lengths.

The reference's training Dataset yields *speaker ids* (``__getitem__``
returns ``idx % n_spk``, ``models/audio_models/datasets.py:141-143``) which
a shuffled DataLoader turns into speaker-balanced batches; the collate
function then draws one random crop length per batch, uniform over
``frames ∈ [200, 400]`` (``datasets.py:113``).

TPU twist: a fresh crop length per batch would mean up to 201 distinct
compiled shapes. :func:`frame_buckets` quantizes the crop-length
distribution onto a small bucket grid (uniform over the buckets, preserving
the [lo, hi] coverage); with the default 11 buckets the first epoch pays 11
compiles and every later step hits the jit cache.
"""

from __future__ import annotations

import numpy as np


def frame_buckets(lo: int, hi: int, n_buckets: int = 11) -> np.ndarray:
    """Evenly spaced crop lengths covering [lo, hi] inclusive."""
    return np.unique(np.linspace(lo, hi, n_buckets).round().astype(int))


class SpeakerBatchSampler:
    """Yields ``(speaker_ids, n_frames)`` batches for one epoch.

    Speaker ids follow the reference's ``shuffled(range(epoch_len)) % n_spk``
    scheme; ``n_frames`` is drawn per batch from the bucket grid.
    """

    def __init__(
        self,
        n_spk: int,
        epoch_length: int,
        batch_size: int,
        frame_range: tuple[int, int] = (200, 400),
        n_buckets: int = 11,
        seed: int = 0,
        drop_last: bool = True,
        bucket_run: int = 1,
    ):
        self.n_spk = n_spk
        self.epoch_length = epoch_length
        self.batch_size = batch_size
        self.buckets = frame_buckets(frame_range[0], frame_range[1], n_buckets)
        self.seed = seed
        self.drop_last = drop_last
        # crop length redrawn every `bucket_run` batches (1 = reference
        # behavior, per batch). Runs of a shared length let the trainer fuse
        # K steps into one device program (`steps_per_dispatch`); lengths
        # remain uniform over the bucket grid, just correlated within a run.
        self.bucket_run = max(int(bucket_run), 1)

    def epoch(self, epoch_idx: int):
        rng = np.random.default_rng((self.seed, epoch_idx))
        order = rng.permutation(self.epoch_length) % self.n_spk
        n_batches = (
            self.epoch_length // self.batch_size
            if self.drop_last
            else -(-self.epoch_length // self.batch_size)
        )
        n_frames = None
        for b in range(n_batches):
            ids = order[b * self.batch_size : (b + 1) * self.batch_size]
            if b % self.bucket_run == 0:
                n_frames = int(rng.choice(self.buckets))
            yield ids, n_frames

    def batches_per_epoch(self) -> int:
        if self.drop_last:
            return self.epoch_length // self.batch_size
        return -(-self.epoch_length // self.batch_size)
