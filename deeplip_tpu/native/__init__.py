"""ctypes bindings for the native IO library (``wavio.cpp``).

Builds the shared library on first use if the toolchain is available
(``make -C deeplip_tpu/native``); falls back cleanly when not —
:func:`available` gates all callers, and the pure-Python
``data.audio_io.read_wav`` remains the default reader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdeeplip_native.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "wavio.cpp")
    stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if (not os.path.exists(_LIB_PATH) or stale) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dl_read_wav.restype = ctypes.c_long
    lib.dl_read_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.dl_wav_info.restype = ctypes.c_int
    lib.dl_wav_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
    ]
    lib.dl_read_wav_batch.restype = None
    lib.dl_read_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
    ]
    if hasattr(lib, "dl_read_npy_batch"):
        lib.dl_read_npy.restype = ctypes.c_long
        lib.dl_read_npy.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_long, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p,
        ]
        lib.dl_read_npy_batch.restype = None
        lib.dl_read_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_char), ctypes.c_int, ctypes.c_int,
        ]
    if hasattr(lib, "dl_read_wav_batch_i16"):
        lib.dl_read_wav_batch_i16.restype = None
        lib.dl_read_wav_batch_i16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
        ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def wav_info(path: str) -> tuple[int, int, int]:
    """(rate, channels, n_frames)"""
    lib = _load()
    rate = ctypes.c_int()
    ch = ctypes.c_int()
    n = ctypes.c_long()
    rc = lib.dl_wav_info(path.encode(), ctypes.byref(rate), ctypes.byref(ch), ctypes.byref(n))
    if rc != 0:
        raise IOError(f"dl_wav_info({path}) failed: {rc}")
    return rate.value, ch.value, n.value


def read_wav(path: str, start: int = 0, stop: int | None = None, mono: bool = True):
    """Native drop-in for ``data.audio_io.read_wav`` (channel-0 float32)."""
    lib = _load()
    rate, _, n_frames = wav_info(path)
    stop = n_frames if stop is None else min(stop, n_frames)
    start = min(start, stop)
    cap = max(stop - start, 0)
    out = np.empty((cap,), np.float32)
    got = lib.dl_read_wav(
        path.encode(), start, stop,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        None,
    )
    if got < 0:
        raise IOError(f"dl_read_wav({path}) failed: {got}")
    return out[:got], rate


def read_wav_batch(
    paths: list[str],
    starts: list[int],
    stops: list[int],
    capacities: list[int],
    n_threads: int = 4,
):
    """Threaded batch decode into one flat buffer.

    Returns ``(flat, offsets, wrote, rates)`` where file i occupies
    ``flat[offsets[i] : offsets[i] + wrote[i]]``.
    """
    lib = _load()
    n = len(paths)
    offsets = np.zeros((n,), np.int64)
    np.cumsum(capacities[:-1], out=offsets[1:]) if n > 1 else None
    flat = np.zeros((int(offsets[-1] + capacities[-1]) if n else 0,), np.float32)
    wrote = np.zeros((n,), np.int64)
    rates = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    arr_l = lambda a: np.ascontiguousarray(a, np.int64).ctypes.data_as(
        ctypes.POINTER(ctypes.c_long)
    )
    lib.dl_read_wav_batch(
        c_paths,
        arr_l(np.asarray(starts)),
        arr_l(np.asarray(stops)),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        arr_l(np.asarray(capacities)),
        wrote.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        n_threads,
    )
    return flat, offsets, wrote, rates


def npy_available() -> bool:
    """True when the built library has the npy/npz entry points."""
    lib = _load()
    return lib is not None and hasattr(lib, "dl_read_npy_batch")


def _probe_npy(paths: list[str], key: str, n_threads: int):
    """Pass-1 probe: payload byte counts, shapes, ndims, descrs."""
    lib = _load()
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_key = key.encode()
    shapes = np.zeros((n, 8), np.int64)
    ndims = np.zeros((n,), np.int32)
    descrs = ctypes.create_string_buffer(n * 8)
    wrote = np.zeros((n,), np.int64)
    zeros = np.zeros((n,), np.int64)
    as_l = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))
    lib.dl_read_npy_batch(
        c_paths, c_key, None, as_l(zeros), as_l(zeros), as_l(wrote),
        as_l(shapes), ndims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        descrs, n, n_threads,
    )
    bad = np.nonzero(wrote < 0)[0]
    if bad.size:
        raise IOError(f"dl_read_npy({paths[bad[0]]!r}) failed: {wrote[bad[0]]}")
    return c_paths, c_key, shapes, ndims, descrs, wrote


def probe_npy_shapes(
    paths: list[str], key: str = "data", n_threads: int = 4
) -> list[tuple[tuple, np.dtype]]:
    """Threaded header probe: ``(shape, dtype)`` per npy/npz file WITHOUT
    reading payloads (the C++ side parses only zip directory + npy header,
    inflating at most the first 4 KB of deflated entries)."""
    if not paths:
        return []
    _, _, shapes, ndims, descrs, _ = _probe_npy(list(paths), key, n_threads)
    out = []
    for i in range(len(paths)):
        descr = descrs.raw[i * 8 : (i + 1) * 8].split(b"\0", 1)[0].decode()
        out.append((tuple(shapes[i, : ndims[i]]), np.dtype(descr)))
    return out


def read_npy_batch(
    paths: list[str], key: str = "data", n_threads: int = 4
) -> list[np.ndarray]:
    """Threaded batch read of npy/npz arrays (GIL-free zip walk + inflate +
    header parse in C++). ``key`` selects the npz member (ignored for plain
    .npy files). Returns one ndarray per path.

    Native fast path for the reference's per-clip ``np.load(...)['data']``
    (``models/video_models/dataset.py:80-88``) and the embedding-npz groups
    the fusion back-ends glob (``models/audio_models/utils.py:357-373``).
    """
    n = len(paths)
    if n == 0:
        return []
    lib = _load()
    c_paths, c_key, shapes, ndims, descrs, wrote = _probe_npy(
        list(paths), key, n_threads)
    as_l = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))

    offsets = np.zeros((n,), np.int64)
    np.cumsum(wrote[:-1], out=offsets[1:])
    flat = np.empty((int(offsets[-1] + wrote[-1]),), np.uint8)

    # pass 2: payload copy
    sizes = wrote.copy()
    lib.dl_read_npy_batch(
        c_paths, c_key, flat.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        as_l(offsets), as_l(sizes), as_l(wrote), as_l(shapes),
        ndims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), descrs, n, n_threads,
    )
    out = []
    for i in range(n):
        if wrote[i] < 0:
            raise IOError(f"dl_read_npy({paths[i]!r}) failed: {wrote[i]}")
        descr = descrs.raw[i * 8 : (i + 1) * 8].split(b"\0", 1)[0].decode()
        arr = flat[int(offsets[i]) : int(offsets[i] + wrote[i])].view(np.dtype(descr))
        out.append(arr.reshape(tuple(shapes[i, : ndims[i]])))
    return out


def read_wav_batch_i16(
    paths: list[str],
    starts: list[int],
    stops: list[int],
    capacities: list[int],
    n_threads: int = 4,
):
    """Threaded batch decode into one flat int16 buffer (PCM16 payloads are
    copied without a float round-trip) — half the host->device bytes of the
    float path; convert on device with ``astype(float32) / 32768``.

    Returns ``(flat_i16, offsets, wrote, rates)`` like :func:`read_wav_batch`.
    """
    lib = _load()
    n = len(paths)
    offsets = np.zeros((n,), np.int64)
    np.cumsum(capacities[:-1], out=offsets[1:]) if n > 1 else None
    flat = np.zeros((int(offsets[-1] + capacities[-1]) if n else 0,), np.int16)
    wrote = np.zeros((n,), np.int64)
    rates = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    arr_l = lambda a: np.ascontiguousarray(a, np.int64).ctypes.data_as(
        ctypes.POINTER(ctypes.c_long)
    )
    lib.dl_read_wav_batch_i16(
        c_paths,
        arr_l(np.asarray(starts)),
        arr_l(np.asarray(stops)),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        arr_l(np.asarray(capacities)),
        wrote.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        n_threads,
    )
    return flat, offsets, wrote, rates
