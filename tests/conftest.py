# Force an 8-device virtual CPU mesh so sharding paths are testable
# without a TPU pod (SURVEY.md §4: standard JAX multi-host test trick).
# Unconditional override: the shell may export JAX_PLATFORMS=axon (the
# single real TPU via tunnel), which would silently serialize the suite
# onto one device and break the sharding tests.
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize may have imported jax already (the axon TPU plugin
# registers at interpreter start), in which case jax latched
# JAX_PLATFORMS=axon before this file ran — override the live config too.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SCENES = pathlib.Path("/root/reference/scenes")
