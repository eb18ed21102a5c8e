import os

# A stale ablation var would stub kernel phases and silently invalidate
# every parity assertion in the suite — refuse to run with it set.
assert not os.environ.get("SKRED_MEGA_ABLATE"), \
    "SKRED_MEGA_ABLATE is set: renders would be invalid; unset it"

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (bench runs on the real chip separately).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import subprocess
import sys

import jax
import pytest

# the axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeated suite runs skip recompiles (entries
# are keyed by platform, so sharing the TPU bench cache dir is safe)
jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def skode_oracle():
    """Path to the reference-parser transcript oracle, building if needed."""
    exe = REPO / "golden" / "build" / "skode_oracle"
    if not exe.exists():
        if not REFERENCE.exists():
            pytest.skip("reference not available to build oracle")
        subprocess.run([str(REPO / "golden" / "build.sh")], check=True)
    return exe


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE.exists():
        pytest.skip("reference not available")
    return REFERENCE
