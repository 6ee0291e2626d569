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
the ~270 MB/batch HBM round trip of materialized frames + power spectrum.

**Measured verdict (r2, final — see BENCH.md "Pallas fused MFCC kernel"):
v2 delivers its designed ~1.9× over v1, but XLA stays faster at bench
shapes (e.g. 1.54 ms vs 2.43 ms, 256×3 s, 'high') and remains the
default.** The workload is compute-bound at ~25-30% small-matmul
efficiency for both paths; the HBM traffic the kernel fuses away costs
only ~0.33 ms and XLA overlaps it, so there is no bandwidth win to
collect, and Mosaic's grid-sequential matmuls cannot beat XLA's pipelined
ones on equal FLOPs. Kept as a selectable backend (config
``python_data_config.backend: pallas``) with exactness tests.
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


@lru_cache(maxsize=None)
def _residue_geometry(frame_len: int, frame_step: int):
    """Alignment classes of frame starts on a 128-lane grid.

    Returns ``(p, stride, nblk, offs, row0, off_max)``: frame ``t = p·u + r``
    starts at sample ``128·(stride·u + row0[r]) + offs[r]`` and spans
    ``nblk`` 128-sample blocks of its residue window.
    """
    g = math.gcd(frame_step, 128)
    p = 128 // g
    stride = frame_step * p // 128
    offs = tuple((r * frame_step) % 128 for r in range(p))
    row0 = tuple((r * frame_step) // 128 for r in range(p))
    nblk = -(-(max(offs) + frame_len) // 128)
    off_max = (row0[-1] + nblk - 1) // stride
    return p, stride, nblk, offs, row0, off_max


@lru_cache(maxsize=None)
def _residue_basis(frame_len: int, frame_step: int, n_fft: int):
    """Per-residue shifted DFT bases, shape ``(p·nblk·128, 2·(n_fft/2))``.

    Block ``(r, i)`` row ``j`` holds basis row ``n = 128·i + j − offs[r]``
    (zero outside ``[0, frame_len)``). Columns ``[0, nb)`` are cos bins
    0..nb−1; columns ``[nb, 2nb)`` are −sin bins with **column nb+0
    replaced by the Nyquist cos row** (−sin bin 0 is structurally zero):
    the packed ``power[0] = re₀² + nyq²`` is exact for both the mel matmul
    (mel weight at bin 0 is structurally zero) and the energy row-sum.
    """
    p, stride, nblk, offs, row0, off_max = _residue_geometry(frame_len, frame_step)
    cos_m, sin_m = spectral.rdft_matrices(frame_len, n_fft)
    nb = n_fft // 2
    basis = np.zeros((p * nblk * 128, 2 * nb), np.float32)
    for r in range(p):
        for i in range(nblk):
            j = np.arange(128)
            n = 128 * i + j - offs[r]
            valid = (n >= 0) & (n < frame_len)
            rows = (r * nblk + i) * 128 + j[valid]
            basis[rows, :nb] = cos_m[n[valid], :nb]
            basis[rows, nb:] = sin_m[n[valid], :nb]
            basis[rows, nb] = cos_m[n[valid], nb]  # Nyquist fold
    return basis


def _feature_kernel_v2(
    rows_hbm, *refs,
    u_tile: int, p: int, stride: int, nblk: int, row0: tuple,
    n_fft: int, feat_type: str, energy: bool, b_tile: int, mode: str,
):
    """``mode`` selects the DFT matmul scheme (Mosaic supports only DEFAULT
    and HIGHEST dot precisions, so 'high' is hand-rolled):

    - 'highest': one f32 basis, 6-pass HIGHEST dots (bit-matches the XLA
      'highest' path to ~5e-5);
    - 'high':    bf16 hi+lo basis split at trace time; 3 DEFAULT dots
                 (hi·hi + hi·lo + lo·hi) ≙ XLA's bf16_3x;
    - 'default': bf16 basis, single DEFAULT dot (training-grade).

    The mel/DCT matmuls always run HIGHEST — they are <5% of the FLOPs and
    log(mel) turns any bf16 relative error into absolute feature error.
    """
    if mode == "high":
        basis_hi, basis_lo, mel_ref, dct_ref, lift_ref, out_ref, win_vmem, sems = refs
    else:
        basis_ref, mel_ref, dct_ref, lift_ref, out_ref, win_vmem, sems = refs
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_b = pl.num_programs(0)
    nb = n_fft // 2
    n_c = win_vmem.shape[1]

    # One double-buffered DMA per distinct block index c = row0[r]+i: the
    # row array is viewed (B, Gu, stride, 128) in HBM and plane c's sublane
    # shift c//stride is baked into the DMA source offset, so every LHS in
    # the compute below is a FULL buffer — no sublane rotations, and the
    # batch-row dim merges into matmul M via a layout-preserving reshape.
    lin = b_idx * n_t + t_idx
    slot = jax.lax.rem(lin, 2)

    def dma_for(linear, slot_idx, c):
        b2 = jax.lax.div(linear, n_t)
        t2 = jax.lax.rem(linear, n_t)
        return pltpu.make_async_copy(
            rows_hbm.at[
                pl.ds(b2 * b_tile, b_tile),
                pl.ds(t2 * u_tile + c // stride, u_tile),
                c % stride,
            ],
            win_vmem.at[slot_idx, c],
            sems.at[slot_idx, c],
        )

    @pl.when(lin == 0)
    def _():
        for c in range(n_c):
            dma_for(lin, slot, c).start()

    @pl.when(lin + 1 < n_b * n_t)
    def _():
        for c in range(n_c):
            dma_for(lin + 1, jax.lax.rem(lin + 1, 2), c).start()

    for c in range(n_c):
        dma_for(lin, slot, c).wait()

    d_pad = out_ref.shape[-1]
    m = b_tile * u_tile

    def mm(a, b, precision=jax.lax.Precision.HIGHEST):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )

    fast = jax.lax.Precision.DEFAULT

    def dft(lhs, blk):
        """One (m, 128) x (128, 2nb) DFT partial under `mode`."""
        sl = pl.ds(blk * 128, 128)
        if mode == "highest":
            return mm(lhs, basis_ref[sl])
        if mode == "default":
            return mm(lhs.astype(jnp.bfloat16), basis_ref[sl], fast)
        hi = lhs.astype(jnp.bfloat16)
        lo = (lhs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (
            mm(hi, basis_hi[sl], fast)
            + mm(hi, basis_lo[sl], fast)
            + mm(lo, basis_hi[sl], fast)
        )

    def pad_d(x):
        return jnp.pad(x, ((0, 0), (0, d_pad - x.shape[-1])))

    for r in range(p):
        acc = jnp.zeros((m, 2 * nb), jnp.float32)
        for i in range(nblk):
            c = row0[r] + i
            # (b_tile, u_tile, 128) -> (b_tile·u_tile, 128): u_tile is a
            # multiple of 8 so the merge preserves the (sublane, lane) layout
            lhs = win_vmem[slot, c].reshape(m, 128)
            acc = acc + dft(lhs, r * nblk + i)
        re, im = acc[:, :nb], acc[:, nb:]
        power = (re * re + im * im) * (1.0 / n_fft)
        mel = mm(power, mel_ref[:])
        mel = jnp.where(mel == 0, _PSF_EPS, mel)
        if feat_type == "fbank":
            out_ref[:, r] = pad_d(mel).reshape(b_tile, u_tile, d_pad)
            continue
        logmel = jnp.log(mel)
        if feat_type == "logfbank":
            out_ref[:, r] = pad_d(logmel).reshape(b_tile, u_tile, d_pad)
            continue
        cep = mm(logmel, dct_ref[:]) * lift_ref[:]
        if energy:
            e = jnp.sum(power, axis=-1, keepdims=True)
            e = jnp.where(e == 0, _PSF_EPS, e)
            col = jax.lax.broadcasted_iota(jnp.int32, cep.shape, 1)
            cep = jnp.where(col == 0, jnp.log(e), cep)
        out_ref[:, r] = pad_d(cep).reshape(b_tile, u_tile, d_pad)


def _v2_eligible(cfg: FeatureConfig) -> bool:
    """Alignment prerequisites of the residue-class kernel."""
    if (cfg.n_fft // 2) % 128 or cfg.n_fft % 2:
        return False
    p, _, _, _, _, _ = _residue_geometry(cfg.frame_len, cfg.frame_step)
    if p > 8:  # basis memory grows ∝ p; hop must be a multiple of 16
        return False
    # The Nyquist fold packs nyq² into power[0] and drops power[n_fft/2], so
    # BOTH edge bins must be mel-weightless. Row 0 is zero unless the first
    # triangle collapses (bins[0]==bins[1]==0 — happens for large n_filt,
    # where psf's floor'd edges make the lowest filter start at weight 1);
    # the last row is zero unless n_filt is huge / high_freq degenerate.
    mel = spectral.mel_filterbank(
        cfg.num_bin, cfg.n_fft, cfg.rate, cfg.low_freq, cfg.high_freq
    )
    return not (mel[0].any() or mel[cfg.n_fft // 2].any())


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "u_tile", "b_tile")
)
def _pallas_features_v2(
    signal: jnp.ndarray,
    cfg: FeatureConfig,
    interpret: bool = False,
    u_tile: int = 64,
    b_tile: int = 4,
) -> jnp.ndarray:
    """Residue-class fused features: ``(B, S) -> (B, T, D)``.

    ``b_tile`` defaults to 4: the n_c window buffers + double-buffered
    output block + f32 bases must fit the 16 MB VMEM scope (b_tile=8 OOMs
    at ~17.6 MB for the default mfcc config).
    """
    frame_len, frame_step = cfg.frame_len, cfg.frame_step
    p, stride, nblk, offs, row0, off_max = _residue_geometry(frame_len, frame_step)
    n_c = row0[-1] + nblk  # distinct block indices c = row0[r]+i
    b, s = signal.shape
    t = num_frames(s, frame_len, frame_step)
    groups = -(-t // p)  # frames t = p·u + r → u groups
    u_tile = max(8, (min(u_tile, -(-groups // 8) * 8) // 8) * 8)
    n_tiles = -(-groups // u_tile)
    gu = n_tiles * u_tile + off_max

    b_tile = max(1, min(b_tile, b))
    b_pad = -(-b // b_tile) * b_tile
    emph = preemphasis(signal, cfg.preemph)
    need = gu * stride * 128
    if need > s:
        emph = jnp.pad(emph, ((0, 0), (0, need - s)))
    rows = emph[:, :need].reshape(b, gu, stride, 128)
    if b_pad != b:
        rows = jnp.pad(rows, ((0, b_pad - b), (0, 0), (0, 0), (0, 0)))

    basis = _residue_basis(frame_len, frame_step, cfg.n_fft)
    mel = spectral.mel_filterbank(
        cfg.num_bin, cfg.n_fft, cfg.rate, cfg.low_freq, cfg.high_freq
    )[: cfg.n_fft // 2]  # Nyquist row dropped (asserted zero by _v2_eligible)
    if cfg.feat_type == "mfcc":
        dct = spectral.dct_matrix(cfg.num_cep, cfg.num_bin)
        lift = spectral.cepstral_lifter(cfg.num_cep, cfg.ceplifter)
        d_out = cfg.num_cep
    else:
        dct = np.zeros((cfg.num_bin, 1))
        lift = np.zeros((1,))
        d_out = cfg.num_bin

    d_pad = -(-d_out // 128) * 128
    mode = {"default": "default", "high": "high"}.get(cfg.precision, "highest")
    basis = jnp.asarray(basis)
    if mode == "highest":
        basis_args = (basis,)
    elif mode == "high":
        hi = basis.astype(jnp.bfloat16)
        basis_args = (hi, (basis - hi.astype(jnp.float32)).astype(jnp.bfloat16))
    else:
        basis_args = (basis.astype(jnp.bfloat16),)
    kernel = functools.partial(
        _feature_kernel_v2,
        u_tile=u_tile, p=p, stride=stride, nblk=nblk, row0=row0,
        n_fft=cfg.n_fft, feat_type=cfg.feat_type, energy=cfg.energy,
        b_tile=b_tile, mode=mode,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // b_tile, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]  # (B, Gu, stride, 128)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(basis_args) + 3),
        out_specs=pl.BlockSpec(
            (b_tile, p, u_tile, d_pad),
            lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b_pad, p, n_tiles * u_tile, d_pad), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n_c, b_tile, u_tile, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_c)),
        ],
        interpret=interpret,
    )(
        rows,
        *basis_args,
        jnp.asarray(mel, jnp.float32),
        jnp.asarray(dct, jnp.float32),
        jnp.asarray(lift.reshape(1, -1), jnp.float32),
    )
    # (B, p, U, D) → frame t = p·u + r ⇒ transpose to (B, U, p, D) and merge
    out = out[:b].transpose(0, 2, 1, 3).reshape(b, n_tiles * u_tile * p, d_pad)
    return out[:, :t, :d_out]


def pallas_audio_features(
    signal: jnp.ndarray,
    cfg: FeatureConfig,
    interpret: bool = False,
    t_tile: int = 128,
    b_tile: int = 8,
    version: str = "auto",
) -> jnp.ndarray:
    """Fused feature extraction: ``(B, S) -> (B, T, D)`` (no CMVN/deltas).

    Pre-emphasis runs as one fused XLA pass; the framed DFT→mel(→DCT)
    pipeline is a single Pallas kernel. ``interpret`` runs the kernel in
    interpreter mode (CPU tests). ``version`` picks the kernel: 'auto'
    routes to the aligned residue-class kernel (v2) whenever its lane
    prerequisites hold, 'v1'/'v2' force one (tests/benchmarks).
    """
    if cfg.feat_type not in ("mfcc", "fbank", "logfbank"):
        raise NotImplementedError(
            f"pallas path supports mel front-ends, not {cfg.feat_type!r}"
        )
    if version not in ("auto", "v1", "v2"):
        raise ValueError(f"unknown kernel version {version!r}")
    if version == "v2" and not _v2_eligible(cfg):
        # the Nyquist fold packs nyq^2 into power[0]; when the edge mel bins
        # carry weight (e.g. large n_filt), v2 would return plausible but
        # WRONG filterbanks — refuse instead of mis-computing
        raise ValueError(
            "config fails the residue-class kernel's alignment/mel-edge "
            "prerequisites (_v2_eligible); use version='auto' or 'v1'"
        )
    if version == "v2" or (version == "auto" and _v2_eligible(cfg)):
        return _pallas_features_v2(
            signal, cfg, interpret=interpret, b_tile=min(b_tile, 4)
        )
    return _pallas_features_v1(
        signal, cfg, interpret=interpret, t_tile=t_tile, b_tile=b_tile
    )


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "t_tile", "b_tile"))
def _pallas_features_v1(
    signal: jnp.ndarray,
    cfg: FeatureConfig,
    interpret: bool = False,
    t_tile: int = 128,
    b_tile: int = 8,
) -> jnp.ndarray:
    """Round-1 hop-blocked kernel (fallback for unaligned configs)."""
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
