"""Test configuration: force CPU backend with 8 virtual devices.

Mirrors the reference's "emulation as the fake backend" test pattern
(reference: OpenCL/Makefile:121-130 — Intel FPGA emulator targets): all tests
run on the CPU backend with an 8-device virtual mesh so sharding paths are
exercised without TPU hardware. Must run before the first `import jax`.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize pre-imports jax and registers a TPU backend,
# so env vars alone are too late; force the platform via the runtime config
# (safe as long as no computation ran yet, which is the case at conftest time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
