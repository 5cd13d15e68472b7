"""Test configuration: run everything on a virtual 8-device CPU mesh in float64.

The reference experiments pin the CPU platform and enable x64 globally
(reference: experiments/1_van_der_pol/vdp.py:47-48); tests mirror that so the
differential oracles (scipy / native RK) are meaningful. Multi-chip sharding
is exercised on a virtual 8-device host mesh, per the TPU-rebuild test plan
(SURVEY.md section 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Silence XLA's AOT-loader feature-string warnings on persistent-cache hits
# (compile and execution happen on the same machine here; the flagged
# "+prefer-no-scatter/-gather" entries are XLA compiler preferences, not
# host ISA features).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS at interpreter start, so the env var alone is not
# enough -- override through the config API before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-dominated (the round-4
# verdict timed the fast tier at >25 min on this 1-core box), and most of
# that is XLA re-compiling identical programs every run.  With the cache,
# only the first run after a code change pays compiles; iteration runs are
# warm.  Opt out with ODECKPT_TEST_NO_COMPCACHE=1 (e.g. to time cold).
if not os.environ.get("ODECKPT_TEST_NO_COMPCACHE"):
    _cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_compcache",
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
