"""Fused Pallas TPU kernel: PCM → framed DFT power → mel → log (→ MFCC).

The jnp front-end (``deeplip_tpu.ops.features``) materializes the framed
signal ``(B, T, frame_len)`` and the power spectrum ``(B, T, n_fft/2+1)`` in
HBM — for a 256×400-frame batch that is ~165 MB + ~105 MB of round-trip HBM
traffic for ~0.1 GFLOP of math: purely bandwidth-bound. This kernel keeps
everything on-chip per (batch-row, frame-tile) grid cell.

Framing trick: rather than materializing overlapping frames (Mosaic cannot
reshape across lane boundaries anyway), the DFT is decomposed over
step-sized row blocks. With hop ``h``, window ``w``, ``k = ceil(w/h)``,
frame ``t`` is the concatenation of sample rows ``r_t, …, r_{t+k-1}``
(each of length ``h``, the last truncated), so

    frames @ C  ==  Σ_{i<k}  rows[i : i+T_tile] @ C_i

where ``C_i`` is the basis rows ``[i·h, i·h+h)`` zero-padded to ``h`` — the
framing *is* the matmul decomposition; each partial product is a dense
``(T_tile, h) x (h, n_bins)`` MXU op:

    HBM rows ──DMA──▶ VMEM (T_tile-1+k, h)
        Σ rows@cos_i, Σ rows@sin_i  → power spectrum   [MXU]
        power @ mel_fb → log (→ @ dct → lifter → c0)   [MXU/VPU]
    features ──▶ HBM (B, T, D)  (the only HBM write)

The overlapping row windows can't be disjoint BlockSpec tiles, so the
row-major signal stays in ANY/HBM space and each grid cell DMAs its own
``(b_tile, T_tile+pad, h)`` window (the guide's manual-DMA pattern, double
buffered, batch-tiled).

Numerics match ``ops.features`` exactly (same basis matrices, f32; verified
on hardware ≤2.5e-5).

Round-1 kernel (``_feature_kernel``, kept as the fallback): hop-blocked
decomposition. Measured 2.9 ms vs 1.55 ms XLA at 128×48000 — the 160-lane
hop pads to 256 (1.9× wasted DFT FLOPs) and the 257-bin output pads to 384.

Round-2 kernel (``_feature_kernel_v2``, the default): **residue-class
decomposition with zero pad waste**. Frame starts ``t·h mod 128`` cycle
with period ``p = 128/gcd(h, 128)`` (h=160 → p=4, offsets {0,32,64,96}).
Frames of residue ``r`` read a 128-aligned window of ``ceil((off_r+L)/128)``
row blocks against a basis zero-shifted by ``off_r`` — every matmul is an
exact ``(U, 128) @ (128, 512)`` with **no padded lanes**:

- the 512-wide RHS is the lane-concat ``[cos_256 | sin_256]`` so one MXU op
  produces both quadratures;
- the odd 257th (Nyquist) bin folds into the sin basis's structurally-zero
  column 0: ``power[0]`` absorbs ``re_0² + nyq²``, which is exact for both
  the mel projection (mel filter weight at bin 0 is structurally zero) and
  the energy row-sum (``Σ packed == Σ true`` by construction);
- no strided access: the row array is viewed ``(B, G, stride, 128)`` in HBM
  and the ``stride`` stride-planes are DMA'd separately, so the per-residue
  row ``stride·u + c`` becomes plane ``c%stride`` sublanes ``u + c//stride``
  — a static 1-sublane shift, which Mosaic lowers as a cheap rotation.

Per-frame DFT FLOPs: ``nblk·128·512·2`` = 524k vs the v1 kernel's 790k and
XLA's (T,400)@(400,514) 411k — within 1.27× of unpadded while eliminating
the ~270 MB/batch HBM round trip of materialized frames + power spectrum
that makes the XLA path bandwidth-bound.
"""

from __future__ import annotations

import functools
import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeplip_tpu.ops import spectral
from deeplip_tpu.ops.features import _PSF_EPS, FeatureConfig
from deeplip_tpu.ops.framing import num_frames, preemphasis


@lru_cache(maxsize=None)
def _dft_row_blocks(frame_len: int, frame_step: int, n_fft: int, h_pad: int):
    """cos/sin bases as (k·h_pad, n_bins) stacked blocks: block i holds basis
    rows [i·h, i·h+h) zero-padded to h_pad (the lane-aligned hop); the kernel
    slices block i with ``pl.ds(i*h_pad, h_pad)``."""
    cos_m, sin_m = spectral.rdft_matrices(frame_len, n_fft)
    k = math.ceil(frame_len / frame_step)
    n_bins = n_fft // 2 + 1
    cos_blocks = np.zeros((k, h_pad, n_bins), np.float32)
    sin_blocks = np.zeros((k, h_pad, n_bins), np.float32)
    for i in range(k):
        lo = i * frame_step
        hi = min(lo + frame_step, frame_len)
        cos_blocks[i, : hi - lo] = cos_m[lo:hi]
        sin_blocks[i, : hi - lo] = sin_m[lo:hi]
    return (
        cos_blocks.reshape(k * h_pad, n_bins),
        sin_blocks.reshape(k * h_pad, n_bins),
    )


def _feature_kernel(
    rows_hbm, cos_ref, sin_ref, mel_ref, dct_ref, lift_ref, out_ref,
    rows_vmem, sems,
    *, t_tile: int, k: int, n_fft: int, feat_type: str, energy: bool,
    b_tile: int,
):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    n_b = pl.num_programs(0)
    window_rows = rows_vmem.shape[2]

    # Double-buffered DMA: each grid cell's window (b_tile batch rows at
    # once, amortizing per-cell overhead) was prefetched by its predecessor;
    # this cell starts the successor's transfer, then waits on its own slot.
    # Offsets/sizes are sublane-aligned; the k row shifts are static vector
    # slices of the loaded window (cheap sublane rotations).
    lin = b_idx * n_tiles + t_idx
    slot = jax.lax.rem(lin, 2)

    def dma_for(linear, slot_idx):
        b2 = jax.lax.div(linear, n_tiles)
        t2 = jax.lax.rem(linear, n_tiles)
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(b2 * b_tile, b_tile), pl.ds(t2 * t_tile, window_rows)],
            rows_vmem.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(lin == 0)
    def _():
        dma_for(lin, slot).start()

    @pl.when(lin + 1 < n_b * n_tiles)
    def _():
        dma_for(lin + 1, jax.lax.rem(lin + 1, 2)).start()

    dma_for(lin, slot).wait()

    d_pad = out_ref.shape[-1]

    def mm(a, b):
        # full-f32 MXU passes; default precision would run bf16 and lose
        # ~3 decimal digits, failing the 1e-4 feature-parity bar
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    # per batch row in the tile: k shifted-window matmuls accumulated (a
    # lane-concat into one wide matmul is not lowerable: Mosaic rejects
    # concats of vectors with mismatched sublane offsets)
    h = rows_vmem.shape[-1]
    out_bins = cos_ref.shape[-1]

    def pad_d(x):
        return jnp.pad(x, ((0, 0), (0, d_pad - x.shape[-1])))

    for r in range(b_tile):
        window = rows_vmem[slot, r]
        re = jnp.zeros((t_tile, out_bins), jnp.float32)
        im = jnp.zeros((t_tile, out_bins), jnp.float32)
        for i in range(k):
            block = window[i : i + t_tile]
            re += mm(block, cos_ref[pl.ds(i * h, h)])
            im += mm(block, sin_ref[pl.ds(i * h, h)])
        power = (re * re + im * im) * (1.0 / n_fft)
        mel = mm(power, mel_ref[:])
        mel = jnp.where(mel == 0, _PSF_EPS, mel)
        if feat_type == "fbank":
            out_ref[r] = pad_d(mel)
            continue
        logmel = jnp.log(mel)
        if feat_type == "logfbank":
            out_ref[r] = pad_d(logmel)
            continue
        cep = mm(logmel, dct_ref[:]) * lift_ref[:]  # (1, d) 2-D broadcast
        if energy:
            e = jnp.sum(power, axis=-1, keepdims=True)
            e = jnp.where(e == 0, _PSF_EPS, e)
            # masked select instead of a lane-unaligned concat
            col = jax.lax.broadcasted_iota(jnp.int32, cep.shape, 1)
            cep = jnp.where(col == 0, jnp.log(e), cep)
        out_ref[r] = pad_d(cep)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "t_tile", "b_tile"))
def pallas_audio_features(
    signal: jnp.ndarray,
    cfg: FeatureConfig,
    interpret: bool = False,
    t_tile: int = 128,
    b_tile: int = 8,
) -> jnp.ndarray:
    """Fused feature extraction: ``(B, S) -> (B, T, D)`` (no CMVN/deltas).

    Pre-emphasis runs as one fused XLA pass; the framed DFT→mel(→DCT)
    pipeline is a single Pallas kernel. ``interpret`` runs the kernel in
    interpreter mode (CPU tests).
    """
    if cfg.feat_type not in ("mfcc", "fbank", "logfbank"):
        raise NotImplementedError(
            f"pallas path supports mel front-ends, not {cfg.feat_type!r}"
        )
    frame_len, frame_step = cfg.frame_len, cfg.frame_step
    b, s = signal.shape
    t = num_frames(s, frame_len, frame_step)
    # DMA offsets are t_idx * t_tile: keep the tile a multiple of 8 sublanes
    t_tile = max(8, (t_tile // 8) * 8)
    t_tile = min(t_tile, max(8, -(-t // 8) * 8))
    n_tiles = -(-t // t_tile)
    k = math.ceil(frame_len / frame_step)
    overlap = -(-(k - 1) // 8) * 8  # window overhang, sublane-aligned
    n_rows = n_tiles * t_tile + overlap

    b_tile = max(1, min(b_tile, b))
    b_pad = -(-b // b_tile) * b_tile
    emph = preemphasis(signal, cfg.preemph)
    need = n_rows * frame_step
    if need > s:
        emph = jnp.pad(emph, ((0, 0), (0, need - s)))
    rows = emph[:, :need].reshape(b, n_rows, frame_step)
    if b_pad != b:
        rows = jnp.pad(rows, ((0, b_pad - b), (0, 0), (0, 0)))
    # pad the lane (hop) dimension up to a multiple of 128 so DMA slices are
    # tiling-aligned; the matching basis rows are zero so results are exact
    h_pad = -(-frame_step // 128) * 128
    if h_pad != frame_step:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, h_pad - frame_step)))

    cos_blocks, sin_blocks = _dft_row_blocks(frame_len, frame_step, cfg.n_fft, h_pad)
    mel = spectral.mel_filterbank(
        cfg.num_bin, cfg.n_fft, cfg.rate, cfg.low_freq, cfg.high_freq
    )
    if cfg.feat_type == "mfcc":
        dct = spectral.dct_matrix(cfg.num_cep, cfg.num_bin)
        lift = spectral.cepstral_lifter(cfg.num_cep, cfg.ceplifter)
        d_out = cfg.num_cep
    else:
        dct = np.zeros((cfg.num_bin, 1))
        lift = np.zeros((1,))
        d_out = cfg.num_bin

    # lane-align the output block; sliced back to d_out at the end
    d_pad = -(-d_out // 128) * 128
    kernel = functools.partial(
        _feature_kernel,
        t_tile=t_tile,
        k=k,
        n_fft=cfg.n_fft,
        feat_type=cfg.feat_type,
        energy=cfg.energy,
        b_tile=b_tile,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // b_tile, n_tiles),
        in_specs=[
            # whole array pinned to HBM (free-form DMA offsets); each grid
            # cell DMAs its own overlapping row windows
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos row blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin row blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dct
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lifter
        ],
        out_specs=pl.BlockSpec(
            (b_tile, t_tile, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_tiles * t_tile, d_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, b_tile, t_tile + overlap, h_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        rows,
        jnp.asarray(cos_blocks),
        jnp.asarray(sin_blocks),
        jnp.asarray(mel, jnp.float32),
        jnp.asarray(dct, jnp.float32),
        jnp.asarray(lift.reshape(1, -1), jnp.float32),
    )
    return out[:b, :t, :d_out]
