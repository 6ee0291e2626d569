"""Mosaic support probe for the pool-kernel layout ops (r3).

The video frontend max-pool ((1,3,3)/s(1,2,2)/p(0,1,1)) needs, inside a
Pallas kernel over ``(F, H, W, C)`` frame blocks (W = sublane dim, C = lane
dim), ONE of the following to compact / expand the stride-2 W axis:

  stride_read   y = x[:, :, 0::2, :]          (sublane stride-2 gather)
  swapaxes      y = jnp.swapaxes(x, 1, 2)      (leading<->sublane transpose)
  roll          y = pltpu.roll(x, 1, axis=2)   (sublane rotation)
  stride_write  out[:, :, 0::2, :] = a         (sublane stride-2 scatter)
  lead_ops      leading-dim reshape/concat/shift (known-good baseline)

This script compile-checks each op against the real Mosaic compiler and
prints PASS/FAIL per op — it decides the kernel's decomposition strategy
before any kernel is written.  Run on the TPU: ``python
benchmarks/pool_mosaic_probe.py`` (compile-only; nothing is executed).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

F, H, W, C = 8, 22, 44, 64
DTYPE = jnp.bfloat16

# Each op is compile-checked in its OWN subprocess with a hard timeout:
# a Mosaic rejection raises (FAIL), but a pathological case can also HANG
# the remote compiler (observed r3: the all-in-one probe sat >15 min on its
# first compile), and a hang must not mask the remaining ops.
PER_OP_TIMEOUT = int(os.environ.get("POOL_PROBE_TIMEOUT", "420"))


def check(name, kernel, out_shape):
    x = jax.ShapeDtypeStruct((F, H, W, C), DTYPE)
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jax.jit(fn).lower(x).compile()
        print(f"{name}: PASS", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 - probe records any rejection
        msg = " ".join(str(e).split())[:220]
        print(f"{name}: FAIL {msg}", flush=True)
        return False


def _run_one_subprocess(name):
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), name],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=PER_OP_TIMEOUT,
    )
    out = proc.stdout or ""
    for ln in out.splitlines():
        if ln.startswith(f"{name}: "):
            print(ln, flush=True)
            return ln.split(": ", 1)[1].startswith("PASS")
    print(f"{name}: FAIL rc={proc.returncode} {' '.join(out.split())[:200]}",
          flush=True)
    return False


def main(only=None):
    results = {}

    def k_lead_ops(x_ref, o_ref):
        x = x_ref[...]
        xr = x.reshape(F, 2, H // 2, W, C)           # leading split
        shifted = jnp.concatenate(                    # leading shift
            [xr[:, :1], xr[:, :-1]], axis=1)
        o_ref[...] = (xr + shifted).reshape(F, H, W, C)

    def k_stride_read(x_ref, o_ref):
        o_ref[...] = x_ref[:, :, 0::2, :] + x_ref[:, :, 1::2, :]

    def k_swapaxes(x_ref, o_ref):
        o_ref[...] = jnp.swapaxes(x_ref[...], 1, 2)

    def k_roll(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 1, axis=2)

    def k_stride_write(x_ref, o_ref):
        half = x_ref[:, :, : W // 2, :]
        o_ref[:, :, 0::2, :] = half
        o_ref[:, :, 1::2, :] = half

    # H-dim (leading) stride-2 slice — needed to pool the non-tiled axis.
    def k_lead_stride(x_ref, o_ref):
        o_ref[...] = x_ref[:, 0::2, :, :] + x_ref[:, 1::2, :, :]

    ops = {
        # lead_ops first: the known-good baseline separates "tunnel is
        # slow/down" (lead_ops also stalls) from op-specific hangs
        "lead_ops": (k_lead_ops, jax.ShapeDtypeStruct((F, H, W, C), DTYPE)),
        "stride_read": (k_stride_read,
                        jax.ShapeDtypeStruct((F, H, W // 2, C), DTYPE)),
        "swapaxes": (k_swapaxes, jax.ShapeDtypeStruct((F, W, H, C), DTYPE)),
        "roll": (k_roll, jax.ShapeDtypeStruct((F, H, W, C), DTYPE)),
        "stride_write": (k_stride_write,
                         jax.ShapeDtypeStruct((F, H, W, C), DTYPE)),
        "lead_stride": (k_lead_stride,
                        jax.ShapeDtypeStruct((F, H // 2, W, C), DTYPE)),
    }

    if only is not None:  # child mode: compile exactly one op in-process
        kernel, out_shape = ops[only]
        return 0 if check(only, kernel, out_shape) else 1

    for name in ops:
        try:
            results[name] = _run_one_subprocess(name)
        except subprocess.TimeoutExpired:
            print(f"{name}: HANG (> {PER_OP_TIMEOUT}s — compiler wedged, "
                  "not a clean rejection)", flush=True)
            results[name] = False

    print({k: ("PASS" if v else "FAIL") for k, v in results.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
