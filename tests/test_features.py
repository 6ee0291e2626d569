"""Parity tests for the on-device audio front-end vs a float64 NumPy oracle.

Parity bar: ≤1e-4 absolute on features computed in float32 on device vs the
oracle's float64 pipeline (the BASELINE.md embedding bar; feature agreement
at this tolerance is a superset requirement).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deeplip_tpu.ops import features as F
from deeplip_tpu.ops import framing
from tests.oracles import psf_oracle as O

RATE = 16000


def _sig(n=8000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float64)


def test_framing_matches_oracle():
    sig = _sig(4321)
    got = np.asarray(framing.frame_signal(jnp.asarray(sig), 400, 160))
    want = O.frame_signal(sig, 400, 160)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_num_frames_training_crop_arithmetic():
    # A crop sized for exactly `frame` frames must produce `frame` frames
    # (reference collate arithmetic, models/audio_models/datasets.py:113-115).
    for frame in (200, 273, 400):
        n = framing.samples_for_frames(frame, 0.025, 0.01, RATE)
        assert framing.num_frames(n, 400, 160) == frame


@pytest.mark.parametrize("nfilt", [24, 26, 60])
def test_fbank_parity(nfilt):
    sig = _sig(6400)
    cfg = F.FeatureConfig(feat_type="fbank", num_bin=nfilt, normalize=False)
    got = np.asarray(F.fbank(jnp.asarray(sig, jnp.float32), cfg))
    want, _ = O.fbank(sig, nfilt=nfilt)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_mfcc_parity():
    sig = _sig(6400)
    cfg = F.FeatureConfig(feat_type="mfcc", num_bin=26, num_cep=24, normalize=False)
    got = np.asarray(F.mfcc(jnp.asarray(sig, jnp.float32), cfg))
    want = O.mfcc(sig)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_logfbank_parity():
    sig = _sig(6400)
    cfg = F.FeatureConfig(feat_type="logfbank", num_bin=60, normalize=False)
    got = np.asarray(F.logfbank(jnp.asarray(sig, jnp.float32), cfg))
    want = O.logfbank(sig, nfilt=60)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_stft_parity():
    sig = _sig(6400)
    cfg = F.FeatureConfig(feat_type="stft", normalize=False)
    got = np.asarray(F.stft_features(jnp.asarray(sig, jnp.float32), cfg))
    want = O.librosa_stft_log1p(sig)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_cmvn_parity():
    feat = np.abs(_sig(200 * 24)).reshape(200, 24)
    got = np.asarray(F.cmvn(jnp.asarray(feat, jnp.float32)))
    want = O.cmvn(feat)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_delta_parity():
    feat = _sig(100 * 24).reshape(100, 24)
    for n in (1, 2):
        got = np.asarray(F.delta(jnp.asarray(feat, jnp.float32), n))
        want = O.delta(feat, n)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_extract_features_batched_and_jittable():
    sigs = np.stack([_sig(6400, s) for s in range(4)])
    cfg = F.FeatureConfig(feat_type="mfcc", normalize=True)
    fn = jax.jit(F.extract_features, static_argnums=1)
    got = np.asarray(fn(jnp.asarray(sigs, jnp.float32), cfg))
    assert got.shape[0] == 4 and got.shape[2] == 24
    for b in range(4):
        want = O.cmvn(O.mfcc(sigs[b]))
        np.testing.assert_allclose(got[b], want, atol=2e-4, rtol=1e-3)


def test_delta_stacking_dim():
    cfg = F.FeatureConfig(feat_type="mfcc", delta=True)
    assert F.feature_dim(cfg) == 72
    sig = jnp.asarray(_sig(4000), jnp.float32)
    out = F.extract_features(sig, cfg)
    assert out.shape[-1] == 72


@pytest.mark.parametrize("rate,win_len,win_shift,nfilt,ncep", [
    (16000, 0.020, 0.008, 30, 13),
    (8000, 0.025, 0.010, 26, 13),
    (16000, 0.032, 0.016, 40, 20),
])
def test_mfcc_parity_config_fuzz(rate, win_len, win_shift, nfilt, ncep):
    """MFCC parity holds across window/rate/filter configurations."""
    rng = np.random.default_rng(rate + nfilt)
    sig = (rng.standard_normal(int(rate * 0.7)) * 0.1)
    cfg = F.FeatureConfig(feat_type="mfcc", rate=rate, win_len=win_len,
                          win_shift=win_shift, num_bin=nfilt, num_cep=ncep,
                          normalize=False)
    got = np.asarray(F.mfcc(jnp.asarray(sig, jnp.float32), cfg))
    want = O.mfcc(sig, rate=rate, winlen=win_len, winstep=win_shift,
                  numcep=ncep, nfilt=nfilt)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
