"""Fused train-mode BatchNorm + PReLU as Pallas TPU kernels (fwd + bwd).

Motivation (VERDICT r4 #5): the video trunk's hot loop is BN+PReLU stacks
over NHWC ``C=64`` activations — tensors that pay ~2.2x tile padding
(lane 64→128, sublane 44→48) on every non-MXU op — and the r3/r4 roofline
attribution left exactly one box unmeasured: a hand-written kernel that
reads the padded tile once per pass and fuses the normalization and the
activation in VMEM. This module is that box. The XLA composition
(``models.norm.TorchBatchNorm`` + ``models.resnet.PReLU``) is already at
the algorithmic traffic minimum for exact batch stats — stats pass
(1 read, with the r3 single-pass ``E[x²]−E[x]²`` fusing both reductions
into one read) + apply pass (1 read, 1 write) — so the kernel can only
win on scheduling/launch overhead, not bytes; the measured verdict
(``benchmarks/bn_prelu_bench.py``, BENCH.md r5) decides whether it ships.

Semantics reproduced exactly (same op order, so parity with the XLA
composition is bit-level in f32):

- batch stats over all leading axes (biased variance, single-pass
  ``E[x²]−E[x]²`` with the ``max(·, 0)`` guard — the ≥4-D branch of
  ``TorchBatchNorm``, reference torch semantics at
  ``/root/reference/models/video_models/resnet.py:30-40``'s BN sites);
- ``y = prelu(((x−μ)·rsqrt(σ²+eps))·scale + bias)`` with per-channel
  PReLU (``where(z>=0, z, α·z)``, torch ``nn.PReLU(C)`` semantics,
  reference ``resnet.py:47``);
- custom VJP with the standard batch-stats BN backward
  ``dx = inv·scale·(dz − mean(dz) − x̂·mean(dz·x̂))`` plus
  ``dscale = Σ dz·x̂``, ``dbias = Σ dz``, ``dα = Σ_{z<0} dy·z``.

Layout: kernels grid over the leading (batch) axis of the native 4-D NHWC
array — blocks are ``(1, H, W, C)``, so the DMA moves exactly the padded
tiles XLA's layout stores (a fair fight: neither side can skip the
padding; flattening to ``(N, C)`` first would charge the kernel an XLA
relayout copy the composition doesn't pay).

Returns ``(y, mean, var)`` so callers can apply the torch running-stat
update outside (``TorchBatchNorm``'s Bessel-corrected accumulation).

Multi-device note: inside a sharded jit the XLA composition computes
GLOBAL batch stats (sync-BN, the documented PARITY.md improvement); a
pallas_call computes per-shard stats (torch DataParallel semantics).
This kernel is therefore an opt-in single-chip measurement vehicle, not
the default path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, sums_ref):
    """Accumulate per-channel Σx and Σx² over the sequential grid."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    xb = x_ref[...].astype(jnp.float32)
    red_axes = tuple(range(xb.ndim - 1))
    sums_ref[0, :] += jnp.sum(xb, axis=red_axes)
    sums_ref[1, :] += jnp.sum(xb * xb, axis=red_axes)


def _apply_kernel(x_ref, mv_ref, par_ref, y_ref):
    """y = prelu(((x−μ)·inv)·scale + bias) — one read, one write."""
    x = x_ref[...]
    mean, inv = mv_ref[0, :], mv_ref[1, :]
    scale, bias, alpha = par_ref[0, :], par_ref[1, :], par_ref[2, :]
    # same op order as TorchBatchNorm + PReLU (bit-parity in f32)
    z = ((x - mean) * inv) * scale + bias
    y_ref[...] = jnp.where(z >= 0, z, alpha * z)


def _bwd_stats_kernel(x_ref, dy_ref, mv_ref, par_ref, red_ref):
    """Per-channel reductions of the backward: [Σdz, Σdz·x̂, Σ_{z<0}dy·z]."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        red_ref[...] = jnp.zeros_like(red_ref)

    x = x_ref[...]
    dy = dy_ref[...]
    mean, inv = mv_ref[0, :], mv_ref[1, :]
    scale, bias, alpha = par_ref[0, :], par_ref[1, :], par_ref[2, :]
    xhat = (x - mean) * inv
    z = xhat * scale + bias
    neg = z < 0
    dz = jnp.where(neg, alpha * dy, dy)
    red_axes = tuple(range(x.ndim - 1))
    red_ref[0, :] += jnp.sum(dz, axis=red_axes)
    red_ref[1, :] += jnp.sum(dz * xhat, axis=red_axes)
    red_ref[2, :] += jnp.sum(jnp.where(neg, dy * z, 0.0), axis=red_axes)


def _bwd_apply_kernel(x_ref, dy_ref, mv_ref, par_ref, m_ref, dx_ref):
    """dx = inv·scale·(dz − mean(dz) − x̂·mean(dz·x̂))."""
    x = x_ref[...]
    dy = dy_ref[...]
    mean, inv = mv_ref[0, :], mv_ref[1, :]
    scale, bias, alpha = par_ref[0, :], par_ref[1, :], par_ref[2, :]
    m_dz, m_dzxh = m_ref[0, :], m_ref[1, :]
    xhat = (x - mean) * inv
    z = xhat * scale + bias
    dz = jnp.where(z < 0, alpha * dy, dy)
    dx_ref[...] = (inv * scale) * (dz - m_dz - xhat * m_dzxh)


def _row_specs(shape, block_rows):
    """(bb, H, W, C) blocks marching down the leading axis."""
    nd = len(shape)
    block = (block_rows,) + shape[1:]
    zeros = (0,) * (nd - 1)

    def imap(i):
        return (i,) + zeros

    return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)


def _bcast_spec(rows, c):
    return pl.BlockSpec((rows, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def bn_prelu_train(x, scale, bias, alpha, eps=1e-5, interpret=False,
                   block_rows=1):
    """Fused train-mode BN(batch stats) + per-channel PReLU.

    ``x``: ``(B, ..., C)`` NHWC-like activations (≥2-D; the video trunk's
    4-D shapes are the target). ``block_rows`` leading rows per grid step
    (must divide ``x.shape[0]``; bigger blocks amortize per-step overhead
    against VMEM). Returns ``(y, mean, var)`` — ``var`` is the biased
    batch variance for the caller's running update. The mean/var outputs
    are running-stat feeds: their cotangents are treated as zero in the
    VJP (do not differentiate through them).
    """
    y, mean, var, _inv = _forward(x, scale, bias, alpha, eps, interpret,
                                  block_rows)
    return y, mean, var


def _grid_rows(shape, block_rows):
    if shape[0] % block_rows:
        raise ValueError(
            f"block_rows {block_rows} must divide leading dim {shape[0]}")
    return (shape[0] // block_rows,)


def _forward(x, scale, bias, alpha, eps, interpret, block_rows):
    assert x.ndim >= 2, "bn_prelu_train expects (..., C) with a leading axis"
    c = x.shape[-1]
    n = x.size // c
    grid = _grid_rows(x.shape, block_rows)
    sums = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[_row_specs(x.shape, block_rows)],
        out_specs=_bcast_spec(2, c),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=interpret,
    )(x)
    mean = sums[0] / n
    # single-pass biased variance with the TorchBatchNorm >=4-D guard
    var = jnp.maximum(sums[1] / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mv = jnp.stack([mean, inv]).astype(x.dtype)
    par = jnp.stack([scale, bias, alpha]).astype(x.dtype)
    y = pl.pallas_call(
        _apply_kernel,
        grid=grid,
        in_specs=[_row_specs(x.shape, block_rows), _bcast_spec(2, c),
                  _bcast_spec(3, c)],
        out_specs=_row_specs(x.shape, block_rows),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, mv, par)
    return y, mean, var, inv


def _fwd(x, scale, bias, alpha, eps, interpret, block_rows):
    y, mean, var, inv = _forward(x, scale, bias, alpha, eps, interpret,
                                 block_rows)
    return (y, mean, var), (x, scale, bias, alpha, mean, inv)


def _bwd(eps, interpret, block_rows, res, cts):
    x, scale, bias, alpha, mean, inv = res
    dy, _dmean, _dvar = cts  # mean/var outputs feed the (stop-grad) running
    # stats update only; their cotangents are structurally zero in training
    c = x.shape[-1]
    n = x.size // c
    grid = _grid_rows(x.shape, block_rows)
    mv = jnp.stack([mean, inv]).astype(x.dtype)
    par = jnp.stack([scale, bias, alpha]).astype(x.dtype)
    red = pl.pallas_call(
        _bwd_stats_kernel,
        grid=grid,
        in_specs=[_row_specs(x.shape, block_rows),
                  _row_specs(x.shape, block_rows),
                  _bcast_spec(2, c), _bcast_spec(3, c)],
        out_specs=_bcast_spec(3, c),
        out_shape=jax.ShapeDtypeStruct((3, c), jnp.float32),
        interpret=interpret,
    )(x, dy, mv, par)
    dbias = red[0]
    dscale = red[1]
    dalpha = red[2]
    means = (red[:2] / n).astype(x.dtype)
    dx = pl.pallas_call(
        _bwd_apply_kernel,
        grid=grid,
        in_specs=[_row_specs(x.shape, block_rows),
                  _row_specs(x.shape, block_rows),
                  _bcast_spec(2, c), _bcast_spec(3, c), _bcast_spec(2, c)],
        out_specs=_row_specs(x.shape, block_rows),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, dy, mv, par, means)
    return (dx, dscale.astype(scale.dtype), dbias.astype(bias.dtype),
            dalpha.astype(alpha.dtype))


bn_prelu_train.defvjp(_fwd, _bwd)


def bn_prelu_reference(x, scale, bias, alpha, eps=1e-5):
    """The XLA composition this kernel races: TorchBatchNorm's ≥4-D
    train-mode math + PReLU, identical op order (bit-parity target)."""
    red_axes = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    xf = x.astype(jnp.float32)
    mean = jnp.sum(xf, axis=red_axes) / n
    var = jnp.maximum(jnp.sum(xf * xf, axis=red_axes) / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    z = ((x - mean.astype(x.dtype)) * inv.astype(x.dtype)) * scale + bias
    y = jnp.where(z >= 0, z, alpha * z)
    return y, mean, var
