"""Pallas fused feature kernel vs the jnp reference path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deeplip_tpu.ops import features as F
from deeplip_tpu.ops.pallas.fbank_kernel import pallas_audio_features


def _sig(b=2, n=48000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((b, n)) * 0.1).astype(np.float32)


@pytest.mark.parametrize("version", ["v1", "auto"])
@pytest.mark.parametrize("feat_type,kw", [
    ("mfcc", {"num_bin": 26, "num_cep": 24, "energy": True}),
    ("mfcc", {"num_bin": 26, "num_cep": 24, "energy": False}),
    ("fbank", {"num_bin": 24}),
    ("logfbank", {"num_bin": 60}),
])
def test_pallas_matches_jnp(feat_type, kw, version):
    cfg = F.FeatureConfig(feat_type=feat_type, normalize=False, **kw)
    sig = jnp.asarray(_sig(b=2, n=16000))
    want = np.asarray(F.extract_features(sig, cfg))
    got = np.asarray(pallas_audio_features(sig, cfg, interpret=True, t_tile=32,
                                           version=version))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_v2_eligibility_guards():
    """The residue kernel refuses configs whose edge mel bins carry weight
    (the Nyquist fold would corrupt them); 'auto' falls back to v1 there."""
    from deeplip_tpu.ops.pallas.fbank_kernel import _v2_eligible

    assert _v2_eligible(F.FeatureConfig(feat_type="mfcc", num_bin=26))
    # 60 filters at 16 kHz: psf's floor'd edges collapse the first triangle
    # so mel row 0 is nonzero -> ineligible
    assert not _v2_eligible(F.FeatureConfig(feat_type="logfbank", num_bin=60))


@pytest.mark.parametrize("frames", [24, 200, 203, 331])
def test_pallas_v2_tile_boundaries(frames):
    from deeplip_tpu.ops.framing import samples_for_frames

    cfg = F.FeatureConfig(feat_type="mfcc", normalize=False)
    n = samples_for_frames(frames, cfg.win_len, cfg.win_shift, cfg.rate)
    sig = jnp.asarray(_sig(b=3, n=n, seed=frames))
    want = np.asarray(F.extract_features(sig, cfg))
    got = np.asarray(pallas_audio_features(sig, cfg, interpret=True,
                                           version="v2"))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_pallas_tile_boundary_exact_multiple():
    cfg = F.FeatureConfig(feat_type="mfcc", normalize=False)
    # 200 frames with t_tile=50 → exact tiling; 203 frames → remainder path
    from deeplip_tpu.ops.framing import samples_for_frames

    for frames in (200, 203):
        n = samples_for_frames(frames, cfg.win_len, cfg.win_shift, cfg.rate)
        sig = jnp.asarray(_sig(b=1, n=n, seed=frames))
        want = np.asarray(F.extract_features(sig, cfg))
        got = np.asarray(pallas_audio_features(sig, cfg, interpret=True, t_tile=50))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
