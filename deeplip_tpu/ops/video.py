"""Batched on-device video transforms for mouth-ROI clips.

The reference preprocesses clips per sample in numpy/OpenCV inside loader
workers (``models/video_models/preprocess.py``; pipelines assembled at
``dataloaders.py:10-26``: train = Normalize(0,255) → RandomCrop(88,88) →
HorizontalFlip(0.5) → Normalize(mean 0.421, std 0.165); val/test = the same
with CenterCrop). Here the whole pipeline is one jittable function over a
``(B, T, H, W)`` uint8 batch: per-sample crop offsets and flip decisions
come from a PRNG key (vmapped ``dynamic_slice``), and the two Normalize
steps fold into a single affine transform that XLA fuses into the frontend
conv. RGB→gray (``preprocess.py:32-49``) uses the standard luma weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Default statistics of the reference pipeline (dataloaders.py:14-16)
CLIP_MEAN = 0.421
CLIP_STD = 0.165


def rgb_to_gray(frames: jnp.ndarray) -> jnp.ndarray:
    """``(..., H, W, 3) -> (..., H, W)`` ITU-R BT.601 luma (cv2 RGB2GRAY)."""
    w = jnp.asarray([0.299, 0.587, 0.114], frames.dtype)
    return jnp.tensordot(frames, w, axes=[[-1], [0]])


def center_crop(clips: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """``(..., H, W) -> (..., th, tw)`` center crop (preprocess.py:74-92)."""
    h, w = clips.shape[-2], clips.shape[-1]
    th, tw = size
    dh = int(round((h - th)) / 2.0)
    dw = int(round((w - tw)) / 2.0)
    return clips[..., dh : dh + th, dw : dw + tw]


def random_crop(clips: jnp.ndarray, size: tuple[int, int], key) -> jnp.ndarray:
    """Per-sample random crop of ``(B, T, H, W)`` (preprocess.py:95-117).

    One offset per *clip* (all frames crop together), like the reference.
    """
    b, t, h, w = clips.shape
    th, tw = size
    kh, kw = jax.random.split(key)
    dh = jax.random.randint(kh, (b,), 0, h - th + 1)
    dw = jax.random.randint(kw, (b,), 0, w - tw + 1)

    def crop_one(clip, oh, ow):
        return jax.lax.dynamic_slice(clip, (0, oh, ow), (t, th, tw))

    return jax.vmap(crop_one)(clips, dh, dw)


def horizontal_flip(clips: jnp.ndarray, key, ratio: float = 0.5) -> jnp.ndarray:
    """Per-sample Bernoulli horizontal flip (preprocess.py:120-138)."""
    b = clips.shape[0]
    flip = jax.random.bernoulli(key, ratio, (b,))
    flipped = clips[..., ::-1]
    return jnp.where(flip[:, None, None, None], flipped, clips)


def normalize_pixels(clips: jnp.ndarray, mean: float = CLIP_MEAN, std: float = CLIP_STD) -> jnp.ndarray:
    """uint8 [0,255] → ((x/255) - mean) / std, the two reference Normalize
    steps folded into one affine op."""
    x = clips.astype(jnp.float32) / 255.0
    return (x - mean) / std


def train_transform(
    clips: jnp.ndarray, key, size: tuple[int, int] = (88, 88),
    mean: float = CLIP_MEAN, std: float = CLIP_STD,
) -> jnp.ndarray:
    """Full train pipeline on a ``(B, T, H, W)`` uint8 batch → float32.

    Crop and flip run on the uint8 tensor and the affine normalize comes
    last — numerically identical to the reference's normalize-first order
    (slice/flip commute with elementwise affine) but ~4× less HBM traffic
    for the 96→88 crop stages (measured 4.2 → ~1.7 ms at bs 128×29 frames).
    """
    kc, kf = jax.random.split(key)
    x = random_crop(clips, size, kc)
    x = horizontal_flip(x, kf)
    return normalize_pixels(x, mean, std)


def eval_transform(
    clips: jnp.ndarray, size: tuple[int, int] = (88, 88),
    mean: float = CLIP_MEAN, std: float = CLIP_STD,
) -> jnp.ndarray:
    """Center-crop eval pipeline (deterministic); crop before the affine
    (same values, less traffic)."""
    return normalize_pixels(center_crop(clips, size), mean, std)


def mask_pad_frames(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero transformed frames at positions ``>= length``.

    Bucketed batches pad clips with uint8 zeros BEFORE the normalize
    affine, which would leave pad frames at ``(0/255 - mean)/std ≈ -2.55``
    — the reference instead zero-pads AFTER its numpy transforms
    (``pad_packed_collate``, ``dataset.py:123-139``), so its pad frames are
    exact zeros. Zeroing post-transform restores that, and because the
    frontend Conv3D (temporal SAME pad 2) is the only op that mixes time
    before the consensus mask, it also makes padded-batch frame features
    bit-equal to the reference's per-clip batch-1 extraction
    (``train_fusion.py:268-274``, ``train_video.py:99-106``): a zeroed pad
    frame contributes exactly what the conv's own zero padding would.

    ``lengths == 0`` rows are left untouched (full length) — callers that
    carry length-0 mesh-padding rows must substitute the source row's real
    length instead (the video trainer replicates row 0 and masks with
    ``where(lengths > 0, lengths, lengths[0])``, ``train/video.py:
    _step_math``), or the replica's raw pads would enter train-mode BN
    statistics at ~-2.55.
    """
    t = x.shape[1]
    eff = jnp.where(lengths > 0, lengths, t)
    mask = (jnp.arange(t)[None, :] < eff[:, None]).astype(x.dtype)
    return x * mask.reshape(mask.shape + (1,) * (x.ndim - 2))


def add_noise_snr(signal: jnp.ndarray, noise: jnp.ndarray, snr_db: float) -> jnp.ndarray:
    """SNR-targeted additive noise for raw audio (preprocess.py:150-179;
    defined-but-unused in the reference, implemented for completeness)."""
    sig_power = jnp.mean(signal**2, axis=-1, keepdims=True)
    noise_power = jnp.mean(noise**2, axis=-1, keepdims=True).clip(1e-12)
    factor = (sig_power / noise_power) / (10.0 ** (snr_db / 10.0))
    return signal + noise * jnp.sqrt(factor)


def normalize_utterance(signal: jnp.ndarray) -> jnp.ndarray:
    """Per-utterance audio z-norm (preprocess.py:141-147)."""
    std = jnp.std(signal, axis=-1, keepdims=True)
    std = jnp.where(std == 0, 1.0, std)
    return (signal - jnp.mean(signal, axis=-1, keepdims=True)) / std


def frontend_conv3d_s2d(kernel: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """The Lipreading frontend Conv3D — 64×(5,7,7), stride (1,2,2), pad
    (2,3,3), C_in=1 (reference ``models/video_models/model.py:81-85``) —
    computed via spatial space-to-depth.

    Lowered directly, this conv runs at ~10% MFU on TPU (r3 attribution,
    ``benchmarks/video_attribution.py``: 36 of the 124 ms bs-128 train
    step): the MXU contraction dim is a 1-channel window and the stride-2
    output decimates systolic-array reuse. Folding the 2×2 spatial phases
    into channels — ``(B,T,H,W,1) → (B,T,H/2,W/2,4)`` — makes it a
    stride-1 conv with kernel (5,4,4) over 4 channels (the classic TPU
    conv0 space-to-depth trick).

    Derivation per spatial axis (pad 3, stride 2, kernel 7):
    ``out[x] = Σ_dx w[dx]·in[2x−3+dx]``; writing ``dx−3 = 2q+r``
    (``q∈[−2,1]``, ``r∈{0,1}``) gives ``out[x] = Σ_{q,r} w2[q,r]·
    in2[x+q, r]`` with ``in2[x',r] = in[2x'+r]`` — a kernel-4 stride-1
    conv with padding (2,1) over the phase channels. 15 of the 64
    ``(q_y,r_y,q_x,r_x)`` slots are structural zeros (1.31× FLOP overhead,
    traded for MXU alignment; measured A/B: ``benchmarks/conv3d_probe.py``).

    The (5,7,7,1,64) parameter is re-scattered at trace time, so
    checkpoints, the torch importer, and eval paths are unchanged. Exact
    same arithmetic as the direct conv up to f32 summation order.

    Args: ``kernel`` (5,7,7,1,64) DHWIO; ``x`` (B,T,H,W,1) NDHWC with H, W
    even. Returns (B,T,H/2,W/2,64) in ``x.dtype`` (MXU accumulation is f32
    internally either way; a f32 output would double the HBM write of a
    ~1 GB activation and break the conv transpose's dtype matching).
    """
    kd, kh, kw, cin, cout = kernel.shape
    assert (kd, kh, kw, cin) == (5, 7, 7, 1), kernel.shape
    b, t, h, w, _ = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)

    # space-to-depth: (B,T,H,W,1) -> (B,T,H/2,W/2,4), phase c = ry*2+rx
    x2 = x.reshape(b, t, h // 2, 2, w // 2, 2)
    x2 = x2.transpose(0, 1, 2, 4, 3, 5).reshape(b, t, h // 2, w // 2, 4)

    # kernel re-scatter: K2[dt, q_y+2, q_x+2, ry*2+rx, o] = K[dt, dy, dx, 0, o]
    k2 = jnp.zeros((kd, 4, 4, 4, cout), kernel.dtype)
    for dy in range(kh):
        qy, ry = divmod(dy - 3, 2)
        for dx in range(kw):
            qx, rx = divmod(dx - 3, 2)
            k2 = k2.at[:, qy + 2, qx + 2, ry * 2 + rx, :].set(
                kernel[:, dy, dx, 0, :])

    dn = jax.lax.conv_dimension_numbers(
        x2.shape, k2.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x2, k2.astype(x2.dtype), window_strides=(1, 1, 1),
        padding=[(2, 2), (2, 1), (2, 1)], dimension_numbers=dn)
