"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices instead (the same GSPMD programs
compile for real TPU meshes).
"""

import os
import sys

# Tests always run on a virtual 8-device CPU mesh.  The ambient environment
# may pin JAX to a tunneled TPU plugin (slow remote compiles); if so, re-exec
# the whole pytest process once with the plugin disabled so the interpreter
# starts clean (the plugin registers itself at interpreter startup, before
# conftest can run).
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "_PECLR_TPU_TEST_REEXEC"
):
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)
    env["_PECLR_TPU_TEST_REEXEC"] = "1"
    os.execvpe(sys.executable, [sys.executable] + sys.orig_argv[1:], env)

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # 8 virtual devices time-share this 1-core box; the default 40 s
    # rendezvous terminate limit flakes under scheduler starvation
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=600"
os.environ["XLA_FLAGS"] = flags

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(5)


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from peclr_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    return make_mesh(data=8)
