"""Test harness config: run all tests on a fake 8-device CPU mesh.

This is the TPU answer to "test multi-device without a cluster": distributed
tests exercise the same Mesh/NamedSharding code paths as the real chips, but
against ``--xla_force_host_platform_device_count=8`` virtual CPU devices.

The ambient environment may install a TPU-tunnel PJRT plugin through a
``sitecustomize`` on PYTHONPATH, with remote compilation hooked into every
process — which both slows CPU test runs by orders of magnitude and perturbs
numerics. Env vars alone don't undo a plugin registered at interpreter
startup, so we deregister its backend factory before JAX initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
for _k in list(os.environ):
    if _k.startswith(("PALLAS_AXON", "AXON_")):
        os.environ.pop(_k)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Deregister non-CPU PJRT backend factories (e.g. the 'axon' TPU tunnel)
# before any backend is initialized. The sitecustomize imports jax at
# interpreter startup, so jax.config captured JAX_PLATFORMS from the ambient
# env — override it through the config API, not just os.environ.
import jax as _jax  # noqa: E402

# Import libraries that register platform-specific lowerings (chex's checkify
# rules for 'tpu', etc.) while the TPU platform is still known; after the
# deregistration below, such registrations would raise.
import chex as _chex  # noqa: E402, F401
import optax as _optax  # noqa: E402, F401
import flax as _flax  # noqa: E402, F401
import jax.experimental.pallas as _pl  # noqa: E402, F401
import jax.experimental.pallas.tpu as _pltpu  # noqa: E402, F401

from jax._src import xla_bridge as _xla_bridge  # noqa: E402

assert not _xla_bridge._backends, "conftest must run before JAX backend init"
_jax.config.update("jax_platforms", "cpu")
for _name in list(_xla_bridge._backend_factories):
    if _name != "cpu":
        _xla_bridge._backend_factories.pop(_name)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
