import os

# Simulate an 8-device TPU pod slice on CPU for sharding tests, and keep
# unit tests off the (single) real TPU so they are hermetic + fast.
# NOTE: the environment pre-sets JAX_PLATFORMS=axon and a sitecustomize
# registers the axon TPU backend, so a plain env default is not enough —
# we must override both the env var and the jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
