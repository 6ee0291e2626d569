"""Native C++ WAV decoder vs the pure-Python reader."""

import wave

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


# ---------------------------------------------------------------------------
# Robustness: truncated/mutated RIFF and npz inputs must raise clean Python
# errors (or report per-file error codes), never crash or return garbage —
# the r2 advisor's short-buffer fix, extended to a property suite (r4).
# ---------------------------------------------------------------------------

def _good_wav_bytes(n=2000, rate=16000, bits=16, channels=1):
    import io
    import struct

    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal(n * channels) * 8000).astype("<i2").tobytes()
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits)
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mutations():
    good = _good_wav_bytes()
    import struct

    def set_bits(data, bits):
        # fmt chunk starts at offset 12; bits field at fmt_data + 14
        return data[:12 + 8 + 14] + struct.pack("<H", bits) + data[12 + 8 + 16:]

    def set_channels(data, ch):
        return data[:12 + 8 + 2] + struct.pack("<H", ch) + data[12 + 8 + 4:]

    return {
        "not_riff": b"JUNK" + good[4:],
        "not_wave": good[:8] + b"XXXX" + good[12:],
        "truncated_header": good[:20],
        "truncated_mid_fmt": good[:30],
        "zero_bits": set_bits(good, 0),        # div-by-zero guard (SIGFPE!)
        "odd_bits": set_bits(good, 12),
        "zero_channels": set_channels(good, 0),
        "empty": b"",
        "no_data_chunk": good[: 12 + 8 + 16],
    }


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_wav_rejects_corrupt_headers(tmp_path):
    for name, data in _mutations().items():
        p = str(tmp_path / f"{name}.wav")
        with open(p, "wb") as f:
            f.write(data)
        with pytest.raises(IOError):
            native.wav_info(p)
        with pytest.raises(IOError):
            native.read_wav(p)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_wav_batch_reports_per_file_errors(tmp_path):
    """Batch decode: corrupt members yield wrote<0 error codes while good
    members still decode (bad files must not poison the batch)."""
    good_p = str(tmp_path / "good.wav")
    with open(good_p, "wb") as f:
        f.write(_good_wav_bytes())
    bad_p = str(tmp_path / "bad.wav")
    with open(bad_p, "wb") as f:
        f.write(_mutations()["zero_bits"])
    missing_p = str(tmp_path / "missing.wav")

    paths = [good_p, bad_p, missing_p]
    flat, offsets, wrote, rates = native.read_wav_batch(
        paths, [0, 0, 0], [1000, 1000, 1000], [1000, 1000, 1000], n_threads=2)
    assert wrote[0] == 1000 and rates[0] == 16000
    assert wrote[1] < 0 and wrote[2] < 0
    ref, _ = read_wav(good_p, stop=1000)
    np.testing.assert_allclose(flat[:1000], ref, atol=1e-7)

    flat16, _, wrote16, _ = native.read_wav_batch_i16(
        paths, [0, 0, 0], [1000, 1000, 1000], [1000, 1000, 1000], n_threads=2)
    assert wrote16[0] == 1000 and wrote16[1] < 0 and wrote16[2] < 0


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_python_wav_reader_rejects_corrupt_headers(tmp_path):
    """The pure-Python fallback reader raises on the same mutation set (it
    must never be the lenient path when the native lib is absent).
    Exception: 12-bit PCM — stdlib ``wave`` rounds it to its 2-byte
    container (documented behavior, a legitimate decode); the native
    reader is stricter and rejects it."""
    for name, data in _mutations().items():
        if name == "odd_bits":
            continue
        p = str(tmp_path / f"{name}.wav")
        with open(p, "wb") as f:
            f.write(data)
        with pytest.raises((ValueError, EOFError, OSError, wave.Error)):
            read_wav(p)


@pytest.mark.skipif(not native.npy_available(), reason="npy entry points unavailable")
def test_native_npz_rejects_corrupt_archives(tmp_path):
    arr = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    good_p = str(tmp_path / "good.npz")
    np.savez_compressed(good_p, data=arr)
    good = open(good_p, "rb").read()

    cases = {
        "truncated_zip": good[: len(good) // 2],
        "no_eocd": good.replace(b"PK\x05\x06", b"PK\x06\x06"),
        "bad_magic": b"XX" + good[2:],
        "empty": b"",
        "npy_bad_magic": b"\x92NUMPY" + b"\x00" * 64,
        "npy_truncated": b"\x93NUMPY\x01\x00\xff\xff",
    }
    for name, data in cases.items():
        p = str(tmp_path / f"{name}.npz")
        with open(p, "wb") as f:
            f.write(data)
        with pytest.raises(IOError):
            native.read_npy_batch([p], key="data")
        with pytest.raises(IOError):
            native.probe_npy_shapes([p], key="data")

    # wrong member name errors rather than returning another member
    with pytest.raises(IOError):
        native.read_npy_batch([good_p], key="nope")

    # and a good archive still round-trips after all that
    (got,) = native.read_npy_batch([good_p], key="data")
    np.testing.assert_array_equal(got, arr)


def test_read_wav_int16_matches_float_reader(wavs, tmp_path):
    """r5 int16-transport fast path: raw PCM16 reads must equal
    round(read_wav(...)*32768) bit-exactly (incl. offsets and stereo
    channel-0), and non-PCM16 widths must raise rather than mis-decode."""
    from deeplip_tpu.data.audio_io import read_wav_int16

    for p in wavs:
        f, rate_f = read_wav(p)
        i, rate_i = read_wav_int16(p)
        assert rate_f == rate_i and i.dtype == np.int16
        np.testing.assert_array_equal(
            i, np.round(f * 32768.0).astype(np.int16))

    f, _ = read_wav(wavs[0], start=1000, stop=5000)
    i, _ = read_wav_int16(wavs[0], start=1000, stop=5000)
    np.testing.assert_array_equal(i, np.round(f * 32768.0).astype(np.int16))

    # 8-bit file -> loud error, not silent garbage
    p8 = str(tmp_path / "w8.wav")
    with wave.open(p8, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes(range(200)))
    with pytest.raises(ValueError, match="not PCM16"):
        read_wav_int16(p8)
