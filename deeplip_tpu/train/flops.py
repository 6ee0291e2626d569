"""FLOP accounting and MFU (model FLOPs utilization) reporting.

The reference publishes no efficiency numbers at all (SURVEY.md §6); for a
production TPU framework, every throughput row should carry the achieved
TFLOP/s and the fraction of the chip's peak it represents. FLOPs per step
come from XLA's own cost analysis of the compiled executable
(``jitted.lower(...).compile().cost_analysis()['flops']``) — the compiler's
HLO-level count of the program actually run, not a hand-derived estimate.

Peaks are per-chip dense bf16 matmul peaks from the published TPU specs.
MFU here is the honest "all counted FLOPs / peak" ratio; it slightly
understates MXU efficiency for programs with large vector-unit components
(DSP, normalization), which is the right direction to err.
"""

from __future__ import annotations

from typing import Any

# Dense bf16 peak FLOP/s per chip, by jax device_kind. (Public spec sheets:
# v2 45T, v3 123T, v4 275T, v5e 197T, v5p 459T, v6e/Trillium 918T.)
_PEAK_BF16: dict[str, float] = {
    "TPU v2": 45e12,
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def peak_flops_per_sec(device: Any = None) -> float | None:
    """Per-chip dense bf16 peak for ``device`` (default: first local device).

    Returns None off-TPU (CPU has no meaningful published peak for this
    comparison; MFU is then omitted rather than invented).
    """
    import jax

    device = device if device is not None else jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    if kind in _PEAK_BF16:
        return _PEAK_BF16[kind]
    for name, peak in _PEAK_BF16.items():  # prefix-match forward-compat
        if kind.startswith(name):
            return peak
    return None


def compiled_flops(jitted, *args, **kwargs) -> float | None:
    """FLOPs of one invocation, from XLA's cost analysis of the compiled
    executable. ``jitted`` must be a ``jax.jit`` (or pjit) callable; args are
    example inputs (abstract shapes suffice — values are not used).
    """
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        return executable_flops(compiled)
    except Exception:
        return None


def executable_flops(compiled) -> float | None:
    """FLOPs from an already-compiled executable's cost analysis."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        return flops if flops > 0 else None
    except Exception:
        return None


def mfu_fields(
    flops_per_step: float | None,
    steps_per_sec: float,
    n_devices: int = 1,
    device: Any = None,
) -> dict:
    """The standard efficiency fields for a bench JSON line / BENCH.md row:
    ``tflops_per_sec`` (achieved, per chip) and ``mfu`` (vs dense bf16 peak).
    Empty dict when FLOPs or the peak are unknown.
    """
    if not flops_per_step or steps_per_sec <= 0:
        return {}
    achieved = flops_per_step * steps_per_sec / max(n_devices, 1)
    out = {"tflops_per_sec": round(achieved / 1e12, 2)}
    peak = peak_flops_per_sec(device)
    if peak:
        out["mfu"] = round(achieved / peak, 4)
    return out
