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
