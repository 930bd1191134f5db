"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4.9: distributed code paths are tested without a pod by
forcing the host platform to expose 8 virtual devices.  The container's site
hook pre-imports jax and pins the platform to the TPU tunnel, so the override
must be programmatic (jax.config) and XLA_FLAGS must be set before the first
backend access.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
