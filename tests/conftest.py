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

# Persistent XLA compile cache for the CPU test backend: the fused
# pipelines (pframe, mesh shard_map) lower for minutes each; repeat
# suite runs hit the cache instead.  Safe here — the known hang is the
# axon REMOTE plugin (bench.py note), and this suite pins JAX_PLATFORMS
# to cpu above.  Opt out with FFV1_TEST_NO_CACHE=1.
if os.environ.get("FFV1_TEST_NO_CACHE", "0") in ("0", "false"):
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
