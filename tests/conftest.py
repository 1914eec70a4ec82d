import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware.  Force cpu even if the environment selected a
# real accelerator platform (e.g. "axon"): parity tests must be
# device-count-deterministic and not burn TPU time.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize hook may register an accelerator plugin and force
# jax_platforms at import time, overriding the env var — override it back.
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"
