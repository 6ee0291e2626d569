"""Video clip dataset: npz/npy mouth-ROI clips with bucketed batching.

The reference globs ``<root>/*/*.npz|npy`` (TCD-TIMIT layout, label = the
speaker path component — ``models/video_models/dataset.py:56-75``), loads
``np.load(...)['data']`` per clip and pads batches sorted by length
(``pad_packed_collate``, ``dataset.py:123-139``). Here clips are bucketed
by temporal length (quantized upward) so the TPU compiles a handful of
shapes, padded with zeros, and shipped as uint8 ``(B, T, H, W)`` with true
lengths — the device transform + masked consensus handle the rest.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from deeplip_tpu.data.prefetch import ThreadedPrefetcher


@dataclass
class VideoClip:
    path: str
    label: int
    name: str  # e.g. 'spk01/clip3'


def scan_clip_dir(data_dir: str, label_list: Sequence[str] | None = None) -> list[VideoClip]:
    """Discover clips; label = index of the speaker directory name.

    ``label_list`` fixes the speaker->index mapping (the reference reads
    label files like ``database/tcdtimit_57SpeakerLabel.txt``); otherwise
    labels are assigned by sorted directory order.
    """
    paths = sorted(
        glob.glob(os.path.join(data_dir, "*", "*.npz"))
        + glob.glob(os.path.join(data_dir, "*", "*.npy"))
    )
    speakers = sorted({p.split(os.sep)[-2] for p in paths})
    if label_list is not None:
        index = {s: i for i, s in enumerate(label_list)}
    else:
        index = {s: i for i, s in enumerate(speakers)}
    clips = []
    for p in paths:
        spk = p.split(os.sep)[-2]
        name = os.path.join(spk, os.path.splitext(os.path.basename(p))[0])
        clips.append(VideoClip(p, index[spk], name))
    return clips


def _squeeze_channel(data: np.ndarray) -> np.ndarray:
    if data.ndim == 4 and data.shape[-1] == 1:
        data = data[..., 0]
    return np.ascontiguousarray(data)


def load_clip(path: str) -> np.ndarray:
    """(T, H, W) uint8 frames from npz (key 'data') or npy (dataset.py:80-88)."""
    if path.endswith(".npz"):
        data = np.load(path)["data"]
    else:
        data = np.load(path)
    return _squeeze_channel(data)


def load_clips(paths: Sequence[str], num_threads: int = 4) -> list[np.ndarray]:
    """Batch clip load; uses the native threaded npz reader when built
    (zip walk + inflate + npy parse run GIL-free in C++), else threaded
    np.load."""
    from deeplip_tpu import native

    if native.npy_available():
        try:
            return [
                _squeeze_channel(a)
                for a in native.read_npy_batch(list(paths), n_threads=num_threads)
            ]
        except (IOError, ValueError) as exc:
            # unusual container (zip64, fortran order): keep the fallback
            # parallel — a serial np.load loop would silently slow epochs
            import warnings

            warnings.warn(f"native npz reader fell back to np.load: {exc}")
    ordered = list(paths)
    out = dict(
        ThreadedPrefetcher(
            ordered, lambda p: (p, load_clip(p)), num_workers=num_threads
        )
    )
    return [out[p] for p in ordered]


def _probe_clip_length(path: str) -> int:
    """Frame count from the npy/npz header only (no payload read)."""
    try:
        from numpy.lib import format as npf

        if path.endswith(".npz"):
            import zipfile

            with zipfile.ZipFile(path) as z, z.open("data.npy") as f:
                shape, _, _ = npf._read_array_header(f, npf.read_magic(f))
        else:
            with open(path, "rb") as f:
                shape, _, _ = npf._read_array_header(f, npf.read_magic(f))
        return int(shape[0])
    except Exception:  # private-API drift or odd container: full load
        return int(len(load_clip(path)))


class VideoClipBatches:
    """Length-bucketed uint8 clip batches for training or extraction."""

    def __init__(
        self,
        clips: Sequence[VideoClip],
        batch_size: int = 32,
        bucket_t: int = 8,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        max_frames: int | None = None,
        pre_crop: tuple[int, int] | None = None,
    ):
        self.clips = list(clips)
        self.batch_size = batch_size
        self.bucket_t = bucket_t
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.max_frames = max_frames
        # EVAL-ONLY: center-crop clips on host before shipping. The device
        # eval transform's center_crop becomes an identity slice, so
        # extraction results are bit-identical while the uint8 H2D drops by
        # 1-(th·tw)/(H·W) (16% at 96→88 — the AV sweep ships 1.7 GB of
        # clips and is transport-bound on the dev rig). Must stay None for
        # TRAINING batches: random_crop needs the full frame.
        self.pre_crop = tuple(pre_crop) if pre_crop else None

    @property
    def n_classes(self) -> int:
        return max(c.label for c in self.clips) + 1

    def _load(self, clip: VideoClip) -> tuple[VideoClip, np.ndarray]:
        data = load_clip(clip.path)
        if self.max_frames:
            data = data[: self.max_frames]
        return clip, data

    def _probe_lengths(self, clips: Sequence[VideoClip]) -> list[int]:
        """Clip frame counts from headers only — no payload reads (native
        C++ probe, else a zipfile/npy-header stream read)."""
        from deeplip_tpu import native

        if native.npy_available():
            try:
                shapes = native.probe_npy_shapes(
                    [c.path for c in clips], n_threads=self.num_workers)
                return [int(s[0][0]) for s in shapes]
            except (IOError, ValueError):
                pass
        return list(
            ThreadedPrefetcher(
                clips, lambda c: _probe_clip_length(c.path),
                num_workers=self.num_workers,
            )
        )

    def epoch(self, epoch_idx: int = 0) -> Iterator[dict]:
        """Length-bucketed batches, streamed: a cheap header scan buckets the
        clips, then each batch's payloads load under a ThreadedPrefetcher —
        O(batch) memory, first step starts after one batch (the round-1
        implementation decoded the whole corpus up front each epoch)."""
        order = np.arange(len(self.clips))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch_idx))
            rng.shuffle(order)
        clips = [self.clips[i] for i in order]
        lengths = self._probe_lengths(clips)
        if self.max_frames:
            lengths = [min(t, self.max_frames) for t in lengths]
        items = list(zip(clips, lengths))
        # stable sort by bucket ONLY: within a bucket the (shuffled) order
        # survives, so epochs see different batch compositions — a
        # (bucket, name) key would be a total order that silently undoes
        # the shuffle every epoch
        items.sort(key=lambda it: -(-it[1] // self.bucket_t))

        specs: list[list[tuple[VideoClip, int]]] = []
        i = 0
        while i < len(items):
            bucket = -(-items[i][1] // self.bucket_t)
            chunk = [
                it for it in items[i : i + self.batch_size]
                if -(-it[1] // self.bucket_t) == bucket
            ]
            i += len(chunk)
            specs.append(chunk)

        def build(chunk):
            arrays = load_clips([c.path for c, _ in chunk],
                                num_threads=self.num_workers)
            if self.max_frames:
                arrays = [a[: self.max_frames] for a in arrays]
            if self.pre_crop:
                # same offset formula as ops/video.center_crop
                # (preprocess.py:74-92) so the composition is exact
                th, tw = self.pre_crop
                h0, w0 = arrays[0].shape[1:]
                dh = int(round((h0 - th)) / 2.0)
                dw = int(round((w0 - tw)) / 2.0)
                arrays = [a[:, dh:dh + th, dw:dw + tw] for a in arrays]
            bucket_frames = max(
                -(-t // self.bucket_t) * self.bucket_t for _, t in chunk)
            h, w = arrays[0].shape[1:]
            batch = np.zeros((len(chunk), bucket_frames, h, w), np.uint8)
            lens = np.zeros((len(chunk),), np.int32)
            labels = np.zeros((len(chunk),), np.int64)
            names = []
            for row, ((clip, _), data) in enumerate(zip(chunk, arrays)):
                batch[row, : len(data)] = data
                lens[row] = len(data)
                labels[row] = clip.label
                names.append(clip.name)
            return {"clips": batch, "lengths": lens, "labels": labels,
                    "names": names}

        yield from ThreadedPrefetcher(
            specs, build, num_workers=1, lookahead=2
        )
