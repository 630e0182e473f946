import os

# NOTE: this environment pre-imports jax via a sitecustomize hook with
# JAX_PLATFORMS=axon (remote TPU tunnel), so the platform must be overridden
# through jax.config (post-import), not os.environ.  XLA_FLAGS is still read
# lazily at first backend initialization, so setting it here works and gives
# every test a deterministic virtual 8-device CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
_cc_dir = os.environ.get(
    "RTSOS_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache",
                                    "jax_cc"))
os.makedirs(_cc_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cc_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
