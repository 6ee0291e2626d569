"""Native C++ WAV decoder vs the pure-Python reader."""

import numpy as np
import pytest

from deeplip_tpu.data.audio_io import read_wav, write_wav
from deeplip_tpu import native


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([16000, 12345, 48000]):
        y = (rng.standard_normal(n) * 0.1).astype(np.float32)
        p = str(root / f"w{i}.wav")
        write_wav(p, y, 16000)
        paths.append(p)
    # stereo file (channel-0 semantics)
    y2 = (rng.standard_normal((8000, 2)) * 0.1).astype(np.float32)
    p = str(root / "stereo.wav")
    write_wav(p, y2, 44100)
    paths.append(p)
    return paths


@pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")
def test_native_matches_python(wavs):
    for p in wavs:
        py, rate_py = read_wav(p)
        nat, rate_nat = native.read_wav(p)
        assert rate_py == rate_nat
        np.testing.assert_allclose(nat, py, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")
def test_native_offset_reads(wavs):
    p = wavs[0]
    py, _ = read_wav(p, start=1000, stop=5000)
    nat, _ = native.read_wav(p, start=1000, stop=5000)
    np.testing.assert_allclose(nat, py, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")
def test_native_batch_read(wavs):
    caps = [4000, 4000, 4000, 4000]
    flat, offsets, wrote, rates = native.read_wav_batch(
        wavs, [0, 100, 200, 0], [4000, 4100, 4200, 4000], caps, n_threads=3
    )
    for i, p in enumerate(wavs):
        start = [0, 100, 200, 0][i]
        py, _ = read_wav(p, start=start, stop=start + 4000)
        got = flat[int(offsets[i]) : int(offsets[i]) + int(wrote[i])]
        np.testing.assert_allclose(got, py[: len(got)], atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")
def test_native_in_pipeline(tmp_path):
    """The native reader slots into the training pipeline via reader=."""
    from deeplip_tpu.data.audio_pipeline import AudioTrainPipeline
    from deeplip_tpu.data.synthetic import make_audio_corpus

    root = str(tmp_path / "c")
    _, manifest = make_audio_corpus(root, n_spk=2, utts_per_spk=2, duration=1.0)
    pipe = AudioTrainPipeline(
        manifest, batch_size=4, frame_range=(20, 30), n_buckets=2,
        num_workers=1, reader=native.read_wav,
    )
    batch = next(iter(pipe.epoch(0)))
    assert batch["pcm"].shape[0] == 4
    assert np.isfinite(batch["pcm"]).all()


@pytest.mark.skipif(not native.npy_available(), reason="native npy reader unavailable")
def test_native_npy_batch_matches_numpy(tmp_path):
    """dl_read_npy_batch == np.load for npz (stored + deflate) and plain npy,
    across dtypes — the clip formats of models/video_models/dataset.py:80-88
    and the embedding stores of utils.py:357-373."""
    rng = np.random.default_rng(0)
    cases = []
    a = rng.integers(0, 255, (29, 96, 96)).astype(np.uint8)
    p = str(tmp_path / "clip.npz"); np.savez(p, data=a); cases.append((p, a))
    b = rng.standard_normal((1, 17, 512)).astype(np.float32)
    p = str(tmp_path / "emb.npz"); np.savez_compressed(p, data=b); cases.append((p, b))
    c = rng.integers(0, 255, (12, 50, 50, 1)).astype(np.uint8)
    p = str(tmp_path / "raw.npy"); np.save(p, c); cases.append((p, c))
    e = rng.integers(-5, 5, (7,)).astype(np.int64)
    p = str(tmp_path / "lab.npz"); np.savez_compressed(p, data=e); cases.append((p, e))
    outs = native.read_npy_batch([p for p, _ in cases], n_threads=3)
    for (path, ref), got in zip(cases, outs):
        assert got.dtype == ref.dtype and got.shape == ref.shape, path
        np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not native.npy_available(), reason="native npy reader unavailable")
def test_native_clip_loader_in_dataset(tmp_path):
    """VideoClipBatches batches are identical with and without the native
    npz reader (including the trailing-channel squeeze and max_frames)."""
    from deeplip_tpu.data.video_dataset import VideoClipBatches, scan_clip_dir

    rng = np.random.default_rng(1)
    for spk in ("s1", "s2"):
        d = tmp_path / "corpus" / spk
        d.mkdir(parents=True)
        for i in range(3):
            clip = rng.integers(0, 255, (10 + i, 24, 24, 1)).astype(np.uint8)
            np.savez(str(d / f"c{i}.npz"), data=clip)
    clips = scan_clip_dir(str(tmp_path / "corpus"))
    batches = VideoClipBatches(clips, batch_size=4, shuffle=False, max_frames=11)
    native_batches = list(batches.epoch(0))
    import deeplip_tpu.native as nat
    orig = nat.npy_available
    nat.npy_available = lambda: False
    try:
        py_batches = list(batches.epoch(0))
    finally:
        nat.npy_available = orig
    assert len(native_batches) == len(py_batches)
    for nb, pb in zip(native_batches, py_batches):
        np.testing.assert_array_equal(nb["clips"], pb["clips"])
        np.testing.assert_array_equal(nb["lengths"], pb["lengths"])
        np.testing.assert_array_equal(nb["labels"], pb["labels"])
        assert nb["names"] == pb["names"]


@pytest.mark.skipif(not native.npy_available(), reason="native npy reader unavailable")
def test_native_npy_short_buffer_errors(tmp_path):
    """A copy pass whose buffer is smaller than the payload (e.g. the file
    grew between the probe and copy passes) must return an error code, not
    the payload size over an unwritten buffer (ADVICE r2)."""
    import ctypes

    arr = np.arange(64, dtype=np.float32)
    cases = [str(tmp_path / "a.npy")]
    np.save(cases[0], arr)
    np.savez(str(tmp_path / "b.npz"), data=arr)  # stored
    cases.append(str(tmp_path / "b.npz"))
    np.savez_compressed(str(tmp_path / "c.npz"), data=arr)  # deflate
    cases.append(str(tmp_path / "c.npz"))

    lib = native._load()
    for path in cases:
        shape = np.zeros(8, np.int64)
        ndim = ctypes.c_int(0)
        descr = ctypes.create_string_buffer(8)
        buf = np.zeros(16, np.uint8)  # far smaller than the 256-byte payload
        rc = lib.dl_read_npy(
            path.encode(), b"data",
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.c_long(16),
            shape.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            ctypes.byref(ndim), descr,
        )
        assert rc < 0, f"{path}: short-capacity copy returned {rc}, want <0"
        # and the probe pass (out=NULL) still reports the payload size
        rc = lib.dl_read_npy(
            path.encode(), b"data", None, ctypes.c_long(0),
            shape.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            ctypes.byref(ndim), descr,
        )
        assert rc == arr.nbytes
