# Force an 8-device virtual CPU mesh so sharding paths are testable
# without a TPU pod (SURVEY.md §4: standard JAX multi-host test trick).
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SCENES = pathlib.Path("/root/reference/scenes")
