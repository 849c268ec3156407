import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding logic is
# exercised without TPU hardware (the standard JAX trick; the driver
# separately dry-runs the multi-chip path).
os.environ["JAX_PLATFORMS"] = "cpu"
# the axon TPU plugin registers itself whenever PALLAS_AXON_POOL_IPS is
# set and overrides platform selection; clear it for CPU-only tests
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# a TPU plugin may already have imported jax.config with
# JAX_PLATFORMS=axon cached (sitecustomize); force CPU explicitly
import jax

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Pin routing to the tunnel profile so route choices (tile sizes,
# device-split thresholds) stay reproducible regardless of the test
# host's measured dispatch RTT; test_routing asserts the derivations.
os.environ.setdefault("COMPAIRR_ROUTE_PROFILE", "tunnel")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TEST_DIR = "/root/reference/test"
