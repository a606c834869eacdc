import os
import sys

# Tests run on a virtual 8-device CPU mesh (sharding validation without
# hardware); real-TPU numbers come from bench.py.  The axon sitecustomize
# may have imported jax already with the TPU platform baked in, so update
# the live config too.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
if "jax" in sys.modules:
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
