from deeplip_tpu.ops.framing import preemphasis, num_frames, frame_signal, pad_for_frames
from deeplip_tpu.ops.spectral import (
    rdft_matrices,
    hann_window,
    mel_filterbank,
    dct_matrix,
    cepstral_lifter,
)
from deeplip_tpu.ops.features import (
    FeatureConfig,
    feature_dim,
    extract_features,
    mfcc,
    fbank,
    logfbank,
    stft_features,
    cmvn,
    add_deltas,
)
from deeplip_tpu.ops.masked import masked_mean, masked_std, masked_mean_std, length_mask

__all__ = [
    "preemphasis",
    "num_frames",
    "frame_signal",
    "pad_for_frames",
    "rdft_matrices",
    "hann_window",
    "mel_filterbank",
    "dct_matrix",
    "cepstral_lifter",
    "FeatureConfig",
    "feature_dim",
    "extract_features",
    "mfcc",
    "fbank",
    "logfbank",
    "stft_features",
    "cmvn",
    "add_deltas",
    "masked_mean",
    "masked_std",
    "masked_mean_std",
    "length_mask",
]
